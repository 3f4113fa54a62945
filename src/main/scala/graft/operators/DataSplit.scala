package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `sample(fraction, seed)` is reproducible only within one engine and
  * one partitioning; a content-hash split is reproducible everywhere,
  * stable under repartitioning/backfills, and lets any engine (or the
  * DuckDB oracle) recompute membership. Standard practice for
  * train/val/test at 100 TB: hash the example id, bucket by hex digit.
  */
object DataSplit {

  /** 16-way bucket from the first hex digit of md5(id-as-string). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("long")

  /** Split label: buckets 0-11 train (75%), 12-13 val (12.5%),
    * 14-15 test (12.5%). */
  def splitLabel(id: Column): Column = {
    val b = hashBucket(id)
    when(b < 12, "train").when(b < 14, "val").otherwise("test")
  }

  def withSplit(df: DataFrame, idCol: String,
                labelName: String = "split"): DataFrame =
    df.withColumn(labelName, splitLabel(col(idCol)))

  /** 256-way bucket (first two hex digits of md5) — fine-grained
    * deterministic sampling rates in units of 1/256. */
  def hashBucket256(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("long")

  /** Weighted deterministic Bernoulli sample: keep each row with
    * inclusion probability min(1, k·w/Σw) — documents are sampled in
    * PROPORTION to a weight (token count for a token-budgeted corpus
    * cut, quality for quality-tilted upsampling) instead of uniformly,
    * with E[kept] = k when no weight saturates. The coin is the same
    * content-hash family as [[hashBucket]] (first 8 md5 hex digits =
    * a 32-bit uniform), so membership is a pure function of
    * (id, weight, corpus total): engine-, partitioning-, and
    * rerun-stable, and the keep verdict is the exact DECIMAL
    * cross-multiplication `h·Σw < k·w·2^32` — no float probability
    * anywhere (longs alone overflow once h·Σw passes 2^63, i.e.
    * Σw ≈ 2^31 — a few billion tokens).
    *
    * Shape: one aggregate to the 1-row total (broadcast back), then a
    * map-only verdict — no shuffle of the data, no sort, no window.
    * Zero-weight rows are never kept.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     expectK: Long): DataFrame = {
    require(expectK >= 0, s"expectK=$expectK must be >= 0")
    // The weight MUST be integral: a fractional weight (e.g. a [0,1]
    // quality score) would truncate to 0 per row and silently return
    // an EMPTY sample — scale such weights to integer units first
    // (quality*10000). Enforced on the resolved type, not left to the
    // cast, because the failure mode is silent.
    Guards.requireIntegral(df.select(weight).schema.head.dataType,
      "weightedSample", "weight",
      "scale fractional weights to integer units first — long " +
        "truncation would zero every sub-1 weight")
    // One canonical long weight for BOTH the total and the per-row
    // verdict (a double sum would also be partition-order dependent,
    // breaking determinism).
    val w = weight.cast("long")
    val tot = df.agg(
      coalesce(sum(w), lit(0L)).cast("long").as("tot_w"))
    val h = conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 8), 16, 10).cast("long")
    df.withColumn("w", w)
      .crossJoin(broadcast(tot))
      .withColumn("keep",
        col("w") > 0 &&
          h.cast("decimal(38,0)") * col("tot_w") <
            lit(expectK).cast("decimal(38,0)") * col("w") *
              lit(4294967296L))
      .drop("tot_w")
  }

  /** Stratified deterministic sample: keep a row iff its content-hash
    * bucket falls under its stratum's rate (out of 256). The
    * data-mixing primitive of a training pipeline — "25% of clicks,
    * 12.5% of views, all purchases" — with membership independent of
    * engine, partitioning, and run (same id ⇒ same verdict, so
    * backfills and retries sample identically). A pure codegen filter:
    * no shuffle, no sort, pushes down past column pruning.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Int],
                       defaultRate: Int = 0): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 256),
      "rates are out of 256")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket256(col(idCol)) < rate)
  }
}
