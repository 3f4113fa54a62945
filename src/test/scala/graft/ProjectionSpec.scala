package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Random projection (JL dim reduction) and hard-negative mining. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal 16-dim axes: cross-cluster cosine
  // ~ 0, within-cluster ~ 1 — the separation any dim reduction must
  // keep
  private def clustered = (0 until 40).map { i =>
    val axis = if (i % 2 == 0) 0 else 8
    val v = Array.fill(16)(0.0f)
    v(axis) = 1.0f
    for (j <- 0 until 16) v(j) = v(j) + 0.001f * ((i * 7 + j) % 5)
    (i.toLong, v.toSeq, i % 2)
  }.toDF("vec_id", "embedding", "cluster")

  test("randomProject matches a direct Scala computation exactly") {
    val got = Similarity
      .randomProject(clustered, "vec_id", "embedding", dim = 16,
        outDim = 4, seed = 7)
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toMap
    val raw = clustered.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    for ((id, vec) <- raw) {
      val xq = vec.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong)
      val want = (0 until 4).map(j =>
        xq.indices.map(i => Similarity.rpSign(7, j, i) * xq(i)).sum)
      assert(got(id) == want, s"vec $id")
    }
  }

  test("randomProject is partitioning-invariant and seed-sensitive") {
    def run(df: org.apache.spark.sql.DataFrame, seed: Int) = Similarity
      .randomProject(df, "vec_id", "embedding", dim = 16, outDim = 4,
        seed = seed)
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toSet
    val base = run(clustered, 7)
    assert(run(clustered.repartition(13), 7) == base)
    assert(run(clustered, 8) != base)
  }

  test("randomProject keeps cluster separation at half the dims") {
    val proj = Similarity
      .randomProject(clustered, "vec_id", "embedding", dim = 16,
        outDim = 8)
      .select("vec_id", "proj")
    val top = Similarity.bruteForceTopK(
      proj.filter(col("vec_id") < 6), proj, "vec_id", "proj", k = 3)
    // every projected neighbour keeps the anchor's cluster: the ~0 vs
    // ~1 cosine margin survives 16 -> 8
    val pairs = top.select("q_id", "c_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    for ((qid, cid) <- pairs)
      assert(qid % 2 == cid % 2, s"anchor $qid got cross-cluster $cid")
  }

  test("randomProject validates dims") {
    intercept[IllegalArgumentException] {
      Similarity.randomProject(clustered, "vec_id", "embedding",
        dim = 16, outDim = 17)
    }
  }

  test("hardNegatives returns only cross-group neighbours, cosine-ordered") {
    val top = Similarity.hardNegatives(
      clustered.filter(col("vec_id") < 6), clustered,
      "vec_id", "embedding", "cluster", k = 3)
    val rows = top.select("q_id", "rank", "c_id", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.length == 6 * 3)
    for ((qid, _, cid, _) <- rows)
      assert(qid % 2 != cid % 2, s"anchor $qid got same-group $cid")
    // per anchor: ranks contiguous from 1, cosine non-increasing
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 3))
      val cs = sorted.map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"anchor $qid")
    }
  }

  test("hardNegatives picks the hardest negatives, not random ones") {
    // anchor group 0; one group-1 vector is made nearly parallel to
    // the anchor (the hard negative) — it must outrank the orthogonal
    // group-1 vectors
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.95f, 0.3f, 0.0f), 1), // hard: cos ~ 0.95
      (2L, Seq(0.0f, 1.0f, 0.0f), 1),  // easy: cos 0
      (3L, Seq(0.0f, 0.0f, 1.0f), 1)   // easy: cos 0
    ).toDF("vec_id", "embedding", "grp")
    val top = Similarity.hardNegatives(df.filter(col("vec_id") === 0),
      df, "vec_id", "embedding", "grp", k = 1)
    assert(top.select("c_id").as[Long].collect().toSeq == Seq(1L))
  }
}
