package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking: rank / ntile / percent_rank / cume_dist
  * over a TOTAL order without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition spec funnels the entire
  * dataset through ONE task — correct at small scale, dead at 100 TB.
  * The scalable formulation decomposes the global rank:
  *
  *   1. bucket each row by a MONOTONE function of the order key
  *      (rows with equal keys must share a bucket);
  *   2. count rows per bucket (distributed hash aggregate);
  *   3. turn counts into cumulative offsets — a window over the
  *      bucket-count table, whose size is bounded by the number of
  *      buckets, NOT the data size;
  *   4. global rank = bucket offset + row_number within the bucket
  *      (a window partitioned by bucket — distributed).
  *
  * ntile / percent_rank / cume_dist are then pure arithmetic on
  * (rank, n). Bucket granularity is the scale knob: choose it so each
  * bucket fits a task comfortably (value-based bins here; a real
  * deployment can range-sample first for equi-depth bins — same shape).
  */
object GlobalRank {

  /** Adds `__rank` (1-based global rank in the total order defined by
    * `order`) and `__n` (total row count) to `df`.
    *
    * @param bucket monotone non-decreasing function of the order key;
    *               equal order keys MUST map to the same bucket.
    * @param order  total order; must uniquify rows (add a tiebreak
    *               column) for cume_dist to be exact.
    */
  def withGlobalRank(df: DataFrame, bucket: Column,
                     order: Seq[Column]): DataFrame = {
    require(Seq("__b", "__off", "__rank", "__n")
        .forall(c => !df.columns.contains(c)),
      "input already has a __b/__off/__rank/__n column")
    val b = df.withColumn("__b", bucket)
    val counts = b.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    // The only unpartitioned window in the plan runs over `counts` —
    // one row per bucket, bounded regardless of data volume.
    val wOff = Window.orderBy(col("__b"))
    val offs = counts.select(
      col("__b"),
      coalesce(
        sum(col("__c")).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("__off"),
      sum(col("__c")).over(
        wOff.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("__n"))
    val wLoc = Window.partitionBy(col("__b")).orderBy(order: _*)
    // null-SAFE equality: a null bucket (null order key) must still
    // join its offset row — a USING join would silently drop those
    // rows while __n kept counting them.
    b.join(broadcast(offs.withColumnRenamed("__b", "__ob")),
        col("__b") <=> col("__ob"))
      .withColumn("__rank", col("__off") + row_number().over(wLoc))
      .drop("__b", "__ob", "__off")
  }

  /** Integer ceil-division; exact for magnitudes < 2^53 (the long/long
    * `/` widens to double, which is lossless in that range). */
  private def ceilDiv(a: Column, d: Column): Column =
    ((a + d - lit(1L)) / d).cast("long")

  /** SQL-standard NTILE(k) from (rank, n): the first n%k tiles get
    * ceil(n/k) rows, the rest floor(n/k). */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    val q = (n / lit(k)).cast("long")
    val rem = n % lit(k)
    val cut = rem * (q + lit(1L))
    when(rank <= cut, ceilDiv(rank, q + lit(1L)))
      .otherwise(rem + ceilDiv(rank - cut, q))
  }

  /** percent_rank = (rank-1)/(n-1); 0.0 for a single row, matching the
    * window function. Bit-identical to the builtin: same integer
    * operands, same double division. */
  def percentRankOf(rank: Column, n: Column): Column =
    when(n === lit(1L), lit(0.0d))
      .otherwise((rank - lit(1L)).cast("double") /
        (n - lit(1L)).cast("double"))

  /** cume_dist = rank/n — exact when `order` was a total order with no
    * ties (otherwise ties would need a max-rank-within-peer-group). */
  def cumeDistOf(rank: Column, n: Column): Column =
    rank.cast("double") / n.cast("double")
}
