package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GraphQueries, RelationalQueries, StreamShapedQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full declared operator surface (SURVEY.md §2B) is assembled from
  * the per-group registries; every entry with an `oracleSql` twin is
  * hash-checked against DuckDB at sf0.01, the rest get rows-only checks
  * plus ScalaTest coverage.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      StreamShapedQueries.queries ++
      TextQueries.queries ++
      VectorQueries.queries ++
      GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for sketch/hash-based ops
    * (approx_count_distinct, minhash, simhash, LSH) → rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      StreamShapedQueries.oracle ++
      TextQueries.oracle ++
      VectorQueries.oracle ++
      GraphQueries.oracle
}
