package graft

import graft.operators.{Curation, DataSplit, Graph, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioning-invariance pins for the operators whose docs sell
  * "engine/partitioning/rerun-exact" determinism (SCALE.md): the SAME
  * input presented with a different partitioning, partition count, or
  * row order must produce the IDENTICAL result, row for row. These
  * are the claims that make backfills and retries safe at 100 TB —
  * a partition-order-dependent sample or drift number silently
  * poisons incremental pipelines. (ModelFit and Pca.fit carry the
  * same pin in their own suites; this one covers the samplers,
  * k-means, PageRank, and the drift kernel.)
  */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  /** The three adversarial presentations of one logical dataset. */
  private def presentations(df: DataFrame): Seq[DataFrame] = Seq(
    df,
    df.repartition(13),
    df.orderBy(rand(99)).repartition(3))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private val docs = (0L until 500L).map { i =>
    (i, s"doc body $i ${"x" * (i % 17).toInt}",
      (i % 7 + 1) * 100L, if (i % 3 == 0) "web" else "books")
  }.toDF("doc_id", "text", "tokens", "source")

  test("weightedSample verdicts are partitioning- and order-exact") {
    val results = presentations(docs).map(d =>
      rows(DataSplit.weightedSample(d, "doc_id", col("tokens"),
        expectK = 120).filter(col("keep")).select("doc_id")))
    assert(results.distinct.size == 1,
      "weighted sample membership moved with partitioning")
    assert(results.head.nonEmpty && results.head.size < 500)
  }

  test("stratifiedSample verdicts are partitioning- and order-exact") {
    val results = presentations(docs).map(d =>
      rows(DataSplit.stratifiedSample(d, "doc_id", "source",
        Map("web" -> 64, "books" -> 192)).select("doc_id")))
    assert(results.distinct.size == 1)
    assert(results.head.nonEmpty && results.head.size < 500)
  }

  test("kmeans assignments are partitioning- and order-exact") {
    val vecs = (0L until 120L).map { i =>
      val c = (i % 3).toInt
      (i, Array.tabulate(6)(j =>
        (c * 10.0 + math.sin(i * 1.7 + j) * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val results = presentations(vecs).map(v =>
      rows(Similarity.kmeans(v, "vec_id", "embedding", k = 3,
        maxIter = 5).select("id", "cluster")))
    assert(results.distinct.size == 1,
      "k-means assignments moved with partitioning — the exact-partials " +
        "determinism contract is broken")
  }

  test("pagerank is partitioning- and order-exact") {
    val edges = (0L until 400L).map(i => (i % 37, (i * 7) % 37))
      .toDF("src", "dst")
    val results = presentations(edges).map(e =>
      rows(Graph.pagerank(e, "src", "dst", iterations = 4)))
    assert(results.distinct.size == 1,
      "integer-recurrence pagerank must not depend on edge presentation")
  }

  test("histDrift TV permille is partitioning- and order-exact") {
    val results = presentations(docs).map(d =>
      rows(Curation.histDrift(d, "source",
        pmod(col("doc_id"), lit(8)))))
    assert(results.distinct.size == 1,
      "DECIMAL cross-multiplied drift must not depend on presentation")
    assert(results.head.nonEmpty)
  }
}
