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

  test("dense model scores corpus docs identically to the join form") {
    val model = Dsir.fitModel(corpus, "doc_id",
      TextAnalysis.tokens(col("text")), isTarget = col("is_t"))
    val viaModel = corpus
      .select(col("doc_id"), Dsir.scoreWith(model,
        TextAnalysis.tokens(col("text"))).as("s"))
      .select(col("doc_id"), col("s.n_grams"), col("s.logw_micro"),
        col("s.keep"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val viaJoin = weights
      .select(col("doc").as("doc_id"), col("n_grams"),
        col("logw_micro"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(viaModel == viaJoin)
  }

  test("dense model scores unseen grams with the smoothed default") {
    val model = Dsir.fitModel(corpus, "doc_id",
      TextAnalysis.tokens(col("text")), isTarget = col("is_t"))
    // recompute the expected fold Scala-side straight from the dense
    // λ — covers the default-fill: these grams never occur in the
    // training corpus, so (absent an md5 bucket collision) their
    // buckets hold the smoothed default, and the score is still exact
    def bucket(g: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Integer.parseInt(md.take(2).map(b => f"$b%02x").mkString.take(3), 16)
    }
    val doc = "zyxxy quorble fnord"
    val grams = Seq("zyxxy", "quorble", "fnord",
      "zyxxy quorble", "quorble fnord")
    val want = grams.map(g => model.lambda(bucket(g))).sum
    val got = Seq((9L, doc)).toDF("doc_id", "text")
      .select(Dsir.scoreWith(model, TextAnalysis.tokens(col("text")))
        .as("s"))
      .select(col("s.n_grams"), col("s.logw_micro"))
      .as[(Long, Long)].head()
    assert(got == ((5L, want)))
  }

  test("gram-less docs are never kept by the dense gate") {
    // tokens("") is [""] (one empty unigram), so a zero-gram doc only
    // arises when the caller's tokenizer yields an empty array — the
    // case the keep rule's strict `0 > 0` guards
    val model = Dsir.fitModel(corpus, "doc_id",
      TextAnalysis.tokens(col("text")), isTarget = col("is_t"))
    val got = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(Dsir.scoreWith(model, col("toks")).as("s"))
      .select(col("s.n_grams"), col("s.keep"))
      .as[(Long, Boolean)].head()
    assert(got == ((0L, false)))
  }

  test("fitModel hexDigits bounds are validated") {
    intercept[IllegalArgumentException] {
      Dsir.fitModel(corpus, "doc_id", TextAnalysis.tokens(col("text")),
        col("is_t"), hexDigits = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.fitModel(corpus, "doc_id", TextAnalysis.tokens(col("text")),
        col("is_t"), hexDigits = 6)
    }
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
