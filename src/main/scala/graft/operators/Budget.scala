package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-budgeting operators: per-group caps (domain balancing) and
  * global token budgets (fixed-size ablation cuts). Both are
  * deterministic — membership is a pure function of the row, never of
  * partitioning — so cuts reproduce across engines and reruns.
  */
object Budget {

  /** Cap each group at `cap` rows, keeping a deterministic
    * hash-ordered sample (salted so the kept set is independent of
    * other hash-bucket uses of the id). The C4/RefinedWeb "no domain
    * may dominate" balancing step.
    *
    * Shape: one row_number window partitioned by the group key. A
    * pathologically hot group lands in one task; if a group can
    * exceed a task's row budget, pre-thin it with a hash-threshold
    * filter (keep rows whose salted bucket < ~cap·256/|group| using
    * an approximate group count) and let this exact cap finish the
    * job — the two-phase form of the same contract.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":cap"))),
        col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Keep rows in priority order until the running total of
    * `weightCol` (e.g. token counts) exceeds `budget` — the "train on
    * the best N tokens" ablation cut.
    *
    * The running sum is distributed with the [[GlobalRank]] recipe:
    * per-bucket partial sums (tiny table), offsets via the only
    * unpartitioned window — over one row PER BUCKET, bounded
    * regardless of data volume — then a within-bucket running sum on
    * top of the bucket offset. `bucket` must be monotone
    * NON-DECREASING along `order` (equal order keys ⇒ same bucket).
    *
    * Output: input columns + `running` (inclusive prefix sum in
    * priority order). A row is kept iff its running total still fits
    * the budget, so the cut is exact to the row, not to the bucket.
    *
    * `order` must be a TOTAL order (append a unique id as the last
    * key, as `capPerGroup` does): rows tied on every order key get
    * running-sum positions in partition-arrival order, so the keep
    * verdict for ties straddling the budget boundary would otherwise
    * vary between runs — the determinism contract above only holds
    * for unique orderings.
    */
  def takeWeightBudget(df: DataFrame, weightCol: String, budget: Long,
                       bucket: Column, order: Seq[Column]): DataFrame = {
    // `running` is in the guard because it is the OUTPUT column:
    // withColumn would silently clobber a same-named input column
    require(Seq("__b", "__off", "__ob", "running")
        .forall(c => !df.columns.contains(c)),
      "input already has a __b/__off/__ob/running column")
    val b = df.withColumn("__b", bucket)
    val sums = b.groupBy(col("__b"))
      .agg(sum(col(weightCol)).as("__s"))
    val wOff = Window.orderBy(col("__b"))
    val offs = sums.select(
      col("__b"),
      coalesce(
        sum(col("__s")).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("__off"))
    val wLoc = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offs.withColumnRenamed("__b", "__ob")),
        col("__b") <=> col("__ob"))
      .withColumn("running", col("__off") + sum(col(weightCol)).over(wLoc))
      .filter(col("running") <= budget)
      .drop("__b", "__ob", "__off")
  }
}
