package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables (TESTDATA.md).
  *
  * Scale note: at 100 TB these would be partitioned/bucketed parquet
  * directories; the loader stays the same (`spark.read.parquet` handles
  * directory trees, partition pruning and predicate pushdown). Nothing
  * here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The driver has shipped events.ts under several physical types
    // across testdata generations (TIMESTAMP(NANOS) — which Spark 4
    // only reads as long nanos —, TIMESTAMP_NTZ micros, plain
    // TIMESTAMP). Normalize them all to one TimestampType column
    // (session zone is UTC everywhere, so NTZ→TZ is value-identical
    // and matches what DuckDB's reader sees), keeping every downstream
    // operator and oracle schema-stable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType => // legacy nanos-as-long
          // FLOOR division, not `div` (which truncates toward zero):
          // a pre-epoch nano timestamp would otherwise round up by
          // one microsecond and diverge from any flooring reader
          df.withColumn("ts",
            timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
        case TimestampType => df
        case _ => df.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else df
  }
}
