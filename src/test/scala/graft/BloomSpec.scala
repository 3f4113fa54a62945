package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomKernels
import graft.operators.Decontaminate

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: no false negatives, ever") {
    val words = new Array[Long](1024 / 64)
    val keys = (0 until 500).map(i => i * 0x9E3779B97F4A7C15L + 7L)
    keys.foreach(BloomKernels.set(words, _, 7))
    assert(keys.forall(BloomKernels.test(words, _, 7)))
  }

  test("kernel: fp rate on disjoint keys stays near theory") {
    // 1000 items at 16 bits/item, k=11 -> theoretical fp ~ 4e-4;
    // assert an order-of-magnitude cushion, not the exact constant
    val numBits = BloomKernels.pickNumBits(1000, 16)
    val k = BloomKernels.pickK(16)
    val words = new Array[Long](numBits / 64)
    (0 until 1000).foreach(i =>
      BloomKernels.set(words, i * 0x9E3779B97F4A7C15L + 7L, k))
    val probes = (1 until 20000).map(i => i * -0x61C8864680B583EBL + 13L)
    val fp = probes.count(BloomKernels.test(words, _, k))
    assert(fp.toDouble / probes.size < 0.01,
      s"fp rate ${fp.toDouble / probes.size} too high")
  }

  test("pickNumBits: power of two, floor 1024, cap enforced") {
    assert(BloomKernels.pickNumBits(0, 16) == 1024)
    assert(BloomKernels.pickNumBits(1000, 16) == 16384)
    val m = BloomKernels.pickNumBits(100000, 16)
    assert(java.lang.Long.bitCount(m.toLong) == 1 && m >= 1600000)
    intercept[IllegalArgumentException] {
      BloomKernels.pickNumBits(1L << 40, 16)
    }
  }

  private def fixture = {
    // doc 0,4,8 are "eval"; doc 1 copies doc 0's text (contaminated),
    // doc 2 shares half its trigrams with doc 4, doc 3 is clean
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", true),
      (4L, "one two three four five six seven", true),
      (8L, "red orange yellow green blue indigo", true),
      (1L, "alpha beta gamma delta epsilon zeta", false),
      (2L, "one two three four nope stop here now", false),
      (3L, "completely fresh words nothing shared at all", false)
    ).toDF("doc_id", "text", "is_eval")
  }

  test("bloomContamination matches exact contamination on the fixture") {
    val docs = fixture
    val model = Decontaminate.buildShingleBloom(
      docs, "doc_id", "text", col("is_eval"), n = 3)
    assert(model.nItems == 13) // eval trigrams: 4 + 5 + 4, all distinct
    val exact = Decontaminate.contamination(
        docs, "doc_id", "text", col("is_eval"), n = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
    val bloom = Decontaminate.bloomContamination(
        docs, "doc_id", "text", col("is_eval"), model, n = 3,
        threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(exact.length == 3 && bloom.length == 3)
    exact.zip(bloom).foreach { case (e, b) =>
      assert(e.getLong(0) == b.getLong(0))
      assert(e.getLong(1) == b.getLong(1)) // n_shingles identical
      // no false negatives: bloom hits >= exact hits
      assert(b.getLong(2) >= e.getLong(2))
    }
    // at 16 bits/item over this tiny universe the fp probability is
    // ~4e-4 — the flag decisions are identical in practice
    assert(exact.map(_.getBoolean(4)).toSeq ==
      bloom.map(_.getBoolean(4)).toSeq)
    assert(exact.map(_.getBoolean(4)).toSeq == Seq(true, false, false))
  }

  test("bloomAudit: zero false negatives, integer fp permille") {
    val docs = fixture
    val model = Decontaminate.buildShingleBloom(
      docs, "doc_id", "text", col("is_eval"), n = 3)
    val row = Decontaminate.bloomAudit(
      docs, "doc_id", "text", col("is_eval"), model, n = 3).collect()(0)
    assert(row.getAs[Long]("n_false_neg") == 0L)
    assert(row.getAs[Long]("n_shingles") == 15L) // 4 + 6 + 5 trigrams
    assert(row.getAs[Long]("n_exact_hits") == 6L) // doc1: 4, doc2: 2
    assert(row.getAs[Long]("n_bloom_hits") >= 6L)
    assert(row.getAs[Long]("fp_permille") >= 0L &&
      row.getAs[Long]("fp_permille") <= 200L)
  }

  test("bloom build is deterministic across rebuilds") {
    val docs = fixture
    val m1 = Decontaminate.buildShingleBloom(
      docs, "doc_id", "text", col("is_eval"), n = 3)
    val m2 = Decontaminate.buildShingleBloom(
      docs, "doc_id", "text", col("is_eval"), n = 3)
    assert(m1.k == m2.k && m1.nItems == m2.nItems)
    assert(m1.words.toSeq == m2.words.toSeq)
  }
}
