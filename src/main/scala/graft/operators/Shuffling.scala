package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible global corpus shuffle + sharding — the last step of a
  * training-data pipeline: break curation order (sources are written
  * contiguously, which would feed the trainer hours of one domain) and
  * assign every row a stable (shard, position) address.
  *
  * Determinism contract: the address of a row is a pure function of
  * (row id, seed) — NOT of partitioning, cluster size, or input order.
  * Reruns, backfills, and engine swaps reproduce the identical order,
  * which is what makes training runs comparable and resumable
  * (mid-epoch restart = seek to (shard, pos)).
  *
  * Shape: shard = hash(id, seed) mod nShards; pos = rank of
  * hash-hex within the shard (md5 string order, id tiebreak). One
  * hash-partitioned exchange + one per-shard sort — the minimum any
  * true global shuffle pays. Each shard sorts in ONE task, so size
  * nShards to the target shard row count (corpus/nShards ≈ 1-10M rows,
  * the usual training-shard file size), never a small constant. The
  * 60-bit hash prefix is uniform, so shard skew is binomial-tight with
  * no salting, and modulo bias is ≤ nShards/2^60 for any Int nShards —
  * a 100B-row corpus at ~1M rows/shard (~100k shards) stays unbiased.
  */
object Shuffling {

  /** Assign each row a deterministic (shard, pos) under `seed`.
    * Output: input columns + shard (0-based) + pos (1-based within
    * shard, ordered by the row's hash — i.e. the shuffled order).
    */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int,
                   seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val skey = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val w = Window.partitionBy("shard")
      .orderBy(col("graft_skey"), col(idCol))
    df.withColumn("graft_skey", skey)
      // first 15 hex chars = 60 uniform bits (fits a signed long), mod
      // nShards — a 16-bit prefix would leave shards above 65536
      // permanently empty and bias any non-power-of-two nShards
      .withColumn("shard",
        pmod(conv(substring(col("graft_skey"), 1, 15), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("graft_skey")
  }
}
