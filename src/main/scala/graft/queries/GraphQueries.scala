package graft.queries

import graft.{QueryFn, Tables}
import graft.operators.{FuzzyJoin, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics + fuzzy (edit-distance) matching over the
  * relational tables — the similarity-join and link-analysis surface a
  * training-data pipeline uses for source weighting (PageRank over the
  * customer↔supplier purchase graph) and noisy-key record linkage
  * (ED-join over entity names).
  *
  * Both queries are oracle-exact: the fuzzy join is lossless by the
  * prefix-filtering theorem (FuzzyJoin.scala) so it hash-matches a
  * brute-force DuckDB `levenshtein` cross join, and PageRank runs in
  * integer micro-units so the DuckDB unrolled-CTE twin matches bit for
  * bit.
  */
object GraphQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Fuzzy-join id cap: 400 near-identical entity names produce ~26k
    * true pairs at edit distance <= 2 — a dense, adversarial corpus for
    * the prefix filter (every dropped pair would hash-mismatch). */
  private val fuzzyIds = 400
  private val fuzzyMaxDist = 2

  /** Supplier node ids are offset into their own range so the
    * customer↔supplier graph has disjoint node ids. */
  private val suppOffset = 1000000L
  private val prIters = 5

  val queries: Map[String, QueryFn] = Map(

    "q_fuzzy_join_ed" -> ((s, d) => {
      // Record-linkage shape: all pairs of entity names within edit
      // distance 2, found by the ED-Join prefix filter (equi-join on
      // rare q-grams), never a string cross join.
      val cust = t(s, d, "customer").filter(col("c_custkey") < fuzzyIds)
      FuzzyJoin.edSelfJoin(cust, "c_custkey", "c_name", fuzzyMaxDist)
        .orderBy("id_a", "id_b")
    }),

    "q_graph_pagerank" -> ((s, d) => {
      // Source-weighting shape: PageRank over the undirected
      // customer↔supplier purchase graph (edge = "this customer
      // ordered from this supplier"), 5 supersteps, integer-exact.
      val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = t(s, d, "orders").select("o_orderkey", "o_custkey")
      val pairs = li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + suppOffset).as("supp"))
      // both directions via ONE explode instead of a self-union of the
      // join subtree — Spark does not dedupe common subtrees, so the
      // union form ran the lineitem⋈orders join twice (guide §2.4:
      // same rows, one pass). Row set identical: unionAll keeps
      // duplicates exactly like the 2-element explode does.
      val edges = pairs.select(explode(array(
          struct(col("cust").as("src"), col("supp").as("dst")),
          struct(col("supp").as("src"), col("cust").as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      Graph.pagerank(edges, "src", "dst", prIters)
        .select(col("node"), col("rank").as("rank_micro"))
        .orderBy("node")
    })
  )

  private val pagerankEdgesSql: String =
    s"""SELECT o_custkey AS src, l_suppkey + $suppOffset AS dst
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |UNION ALL
       |SELECT l_suppkey + $suppOffset AS src, o_custkey AS dst
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  val oracle: Map[String, String] = Map(

    "q_fuzzy_join_ed" ->
      s"""SELECT CAST(a.c_custkey AS BIGINT) AS id_a,
         |       CAST(b.c_custkey AS BIGINT) AS id_b,
         |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         |WHERE a.c_custkey < $fuzzyIds AND b.c_custkey < $fuzzyIds
         |  AND levenshtein(a.c_name, b.c_name) <= $fuzzyMaxDist
         |ORDER BY id_a, id_b""".stripMargin,

    "q_graph_pagerank" ->
      Graph.pagerankOracleSql(pagerankEdgesSql, prIters)
  )
}
