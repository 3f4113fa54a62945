package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, TextAnalysis}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // disjoint vocabularies so the expected sign of every weight is
  // obvious: fruit = target distribution, tools = raw-only noise
  private def corpus = Seq(
    (1L, "apple banana cherry damson elder", true),
    (2L, "banana cherry apple elder damson", true),
    (3L, "hammer wrench pliers chisel rasp", false),
    (4L, "wrench hammer rasp pliers chisel", false),
    (5L, "apple banana cherry damson elder", false), // target-like raw doc
    (6L, "hammer apple wrench banana rasp", false)   // mixed
  ).toDF("doc_id", "text", "is_t")

  private def weights = Dsir.importanceWeights(
    corpus, "doc_id", TextAnalysis.tokens(col("text")),
    isTarget = col("is_t"), persistCounts = false)

  test("n_grams counts unigrams + bigrams") {
    // 5 tokens -> 5 unigrams + 4 bigrams = 9 per doc
    assert(weights.select("n_grams").as[Long].collect().toSet == Set(9L))
  }

  test("weights separate target-like from raw-only docs") {
    val w = weights.select("doc", "logw_micro", "keep")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    // absolute sign is corpus-shifted by smoothing (see Scaladoc), so
    // assert the RELATIVE structure: target-vocab docs (1, 2, 5) are
    // kept — including doc 5, which is NOT in the target set but looks
    // like it — and outrank every pure tool-vocab doc (3, 4)
    for (id <- Seq(1L, 2L, 5L)) {
      assert(w(id)._2, s"doc $id should be kept as target-like")
      for (raw <- Seq(3L, 4L))
        assert(w(id)._1 > w(raw)._1,
          s"doc $id should outscore raw-only doc $raw")
    }
    for (id <- Seq(3L, 4L))
      assert(!w(id)._2, s"doc $id should be dropped as raw-like")
    // the mixed doc sits strictly between the pure ones
    assert(w(6L)._1 > w(3L)._1 && w(6L)._1 < w(1L)._1)
  }

  test("identical docs get identical weights") {
    val w = weights.select("doc", "logw_micro")
      .as[(Long, Long)].collect().toMap
    assert(w(1L) == w(5L)) // same text, target flag plays no per-doc role
  }

  test("partitioning invariance: exact integer sums") {
    val base = weights.select("doc", "n_grams", "logw_micro")
      .collect().toSet
    val repart = Dsir.importanceWeights(
        corpus.repartition(7), "doc_id",
        TextAnalysis.tokens(col("text")),
        isTarget = col("is_t"), persistCounts = false)
      .select("doc", "n_grams", "logw_micro").collect().toSet
    assert(base == repart)
  }

  test("hexDigits bounds are validated") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(corpus, "doc_id",
        TextAnalysis.tokens(col("text")), col("is_t"), hexDigits = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(corpus, "doc_id",
        TextAnalysis.tokens(col("text")), col("is_t"), hexDigits = 8)
    }
  }
}
