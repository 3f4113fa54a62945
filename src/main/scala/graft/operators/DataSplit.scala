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
