package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** PCA: exact covariance moments, planted-axis recovery, and the
  * map-only literal-basis projection. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // variance planted on two axes: axis 1 swings ±2, axis 5 swings ±1,
  // everything else is a small deterministic ripple — the top-2
  // principal axes any correct fit must recover, in that order
  private val dim = 8
  private def planted = (0 until 60).map { i =>
    val v = Array.fill(dim)(0.0f)
    v(1) = if (i % 2 == 0) 2.0f else -2.0f
    v(5) = if (i % 3 == 0) 1.0f else -0.5f
    for (j <- 0 until dim) v(j) = v(j) + 0.01f * ((i * 7 + j) % 5)
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("covMoments matches a direct Scala computation exactly") {
    val got = Pca.covMoments(planted, "vec_id", "embedding")
      .select(col("i"), col("j"), col("n"),
        col("s_i").cast("long"), col("s_j").cast("long"),
        col("s_ij").cast("long"), col("cov_num").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => ((r._1, r._2), (r._3, r._4, r._5, r._6, r._7)))
      .toMap
    val raw = planted.select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong))
    assert(got.size == dim * (dim + 1) / 2)
    for (i <- 0 until dim; j <- i until dim) {
      val n = raw.length.toLong
      val si = raw.map(_(i)).sum
      val sj = raw.map(_(j)).sum
      val sij = raw.map(v => v(i) * v(j)).sum
      assert(got((i.toLong, j.toLong)) ==
        ((n, si, sj, sij, n * sij - si * sj)), s"pair ($i,$j)")
    }
  }

  test("fit recovers the planted variance axes, in eigenvalue order") {
    val m = Pca.fit(planted, "vec_id", "embedding", dim, k = 2)
    assert(m.n == 60)
    // top component is the ±2 axis, second the ±1/-0.5 axis; the
    // ripple is 0.01-scale so alignment must be near-perfect
    assert(math.abs(m.components(0)(1)) > 0.999,
      s"c0 not on axis 1: ${m.components(0).toSeq}")
    assert(math.abs(m.components(1)(5)) > 0.99,
      s"c1 not on axis 5: ${m.components(1).toSeq}")
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > 0)
    // micro^2 units: axis-1 population variance is 4.0 => 4e12
    assert(math.abs(m.eigenvalues(0) / 4.0e12 - 1.0) < 0.01,
      s"eig0 = ${m.eigenvalues(0)}")
  }

  test("fitted components are orthonormal with the documented sign") {
    val m = Pca.fit(planted, "vec_id", "embedding", dim, k = 3)
    for (a <- 0 until 3; b <- a until 3) {
      val dot = (0 until dim).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"dot($a,$b) = $dot")
    }
    for (c <- 0 until 3) {
      val v = m.components(c)
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(pivot) > 0, s"component $c sign not canonical")
    }
  }

  test("fit is partitioning-invariant (exact moments in, same basis out)") {
    val a = Pca.fit(planted, "vec_id", "embedding", dim, k = 2)
    val b = Pca.fit(planted.repartition(13), "vec_id", "embedding", dim, k = 2)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }

  test("project matches the direct centered dot product") {
    val m = Pca.fit(planted, "vec_id", "embedding", dim, k = 2)
    val got = Pca.project(planted, "embedding", m)
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    val raw = planted.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    for ((id, vec) <- raw) {
      val xq = vec.map(x => math.floor(x.toDouble * 1000000.0 + 0.5))
      val want = (0 until 2).map(c =>
        xq.indices.map(i => m.components(c)(i) * (xq(i) - m.mean(i))).sum)
      for (c <- 0 until 2)
        assert(math.abs(got(id)(c) - want(c)) < 1e-6,
          s"vec $id comp $c: ${got(id)(c)} vs ${want(c)}")
    }
  }

  test("projection preserves the planted variance split") {
    val m = Pca.fit(planted, "vec_id", "embedding", dim, k = 2)
    val proj = Pca.project(planted, "embedding", m)
      .select("proj").as[Seq[Double]].collect()
    def popVar(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val v0 = popVar(proj.map(_(0)).toSeq)
    val v1 = popVar(proj.map(_(1)).toSeq)
    // projected variances are the eigenvalues (micro^2 units)
    assert(math.abs(v0 / m.eigenvalues(0) - 1.0) < 1e-6)
    assert(math.abs(v1 / m.eigenvalues(1) - 1.0) < 1e-6)
  }

  test("fit validates k") {
    intercept[IllegalArgumentException] {
      Pca.fit(planted, "vec_id", "embedding", dim, k = 0)
    }
    intercept[IllegalArgumentException] {
      Pca.fit(planted, "vec_id", "embedding", dim, k = dim + 1)
    }
  }
}
