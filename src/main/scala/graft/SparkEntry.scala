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
    * the same parquet tables. Omitted only for the two sketch rows
    * whose OUTPUT is the approximation (approx_count_distinct,
    * percentile_approx) → rows-only check; every other family's
    * hash/iterative state is pinned through agreement/verdict rows
    * with constant oracles. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      StreamShapedQueries.oracle ++
      TextQueries.oracle ++
      VectorQueries.oracle ++
      GraphQueries.oracle

  /** Bench-only tenses (run by [[Bench]], not by the verify harness):
    * raw listing forms of operators whose queries-map entry became a
    * verdict row, kept so the sweep keeps measuring the production
    * probe shape alone. */
  def benchOnlyQueries: Map[String, (SparkSession, String) => DataFrame] =
    TextQueries.benchOnly
}
