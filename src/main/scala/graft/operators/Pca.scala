package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over the embedding column, built on
  * the engine's moments-reduce + driver-solve pattern ([[ModelFit]]'s
  * normal equations, [[Similarity.kmeans]]'s k·dim partials): ONE
  * corpus pass reduces to the d(d+1)/2 exact covariance moments, the
  * tiny d×d eigenproblem is solved on the driver (power iteration
  * with deflation — deterministic start vectors, fixed iteration
  * count), and the projection returns to the cluster as a map-only
  * literal-matrix scan (the [[Similarity.randomProject]] shape, with
  * the data-derived basis instead of the JL coin matrix).
  *
  * Scale shape: each partition folds its rows into ONE primitive
  * d(d+1)/2 accumulator (the k-means fused-loop stance — measured 8×
  * over the struct-explode formulation this replaced), so the shuffle
  * carries partitions·d² tiny rows regardless of corpus size; driver
  * state is O(d²) (64-dim ⇒ 2080 pairs); the projection adds zero
  * exchanges.
  *
  * Exactness: vectors are micro-quantized ([[Similarity
  * .microQuantize]]) and the moment sums ride DECIMAL(38,0), so the
  * collected moments — and therefore the fitted basis — are a pure
  * function of the data, independent of partitioning and engine
  * (the centered numerator is oracle-checkable in DuckDB HUGEINT).
  */
object Pca {

  /** Exact pairwise covariance moments: one row per dimension pair
    * (i ≤ j, 0-based) carrying `n`, the micro-unit sums `s_i`, `s_j`,
    * `s_ij`, and the centered covariance numerator
    * `cov_num = n·s_ij − s_i·s_j` (micro²·n² units; DECIMAL until the
    * final column so nothing overflows at any corpus size — callers
    * needing BIGINT cast when their scale allows, the §7.4 HUGEINT
    * rule). */
  def covMoments(vecs: DataFrame, idCol: String, vecCol: String):
  DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val xq = Similarity.nonNullVecs(vecs, vecCol)
      .select(transform(Similarity.toDouble(col(vecCol)),
        Similarity.microQuantize(_)).as("xq")).as[Seq[Long]]
    // fused per-partition fold: n, per-dim sums, and the upper
    // triangle of product sums in primitive long arrays — the genuine
    // per-partition imperative case (same stance as kmeans' iterate).
    // Long partials stay EXACT: products/sums go through
    // multiplyExact/addExact (fail-fast, never silent wrap) and the
    // accumulator flushes every FLUSH rows, so a block overflows only
    // past |x| ≈ 3.0 (3e6 micro ⇒ 9e12 per product × 2^20 rows ≈
    // Long.Max); cross-block and cross-partition sums ride DECIMAL.
    val FLUSH = 1 << 20
    val partials = xq.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val d = first.length
        val nPairs = d * (d + 1) / 2
        var n = 0L
        val s = new Array[Long](d)
        val p = new Array[Long](nPairs)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long, Long)]
        def flush(): Unit = {
          if (n > 0) {
            var i = 0; var idx = 0
            while (i < d) {
              var j = i
              while (j < d) {
                out += ((i.toLong, j.toLong, n, s(i), s(j), p(idx)))
                idx += 1; j += 1
              }
              i += 1
            }
            n = 0
            java.util.Arrays.fill(s, 0L)
            java.util.Arrays.fill(p, 0L)
          }
        }
        def add(vec: Seq[Long]): Unit = {
          val a = vec.toArray
          require(a.length == d,
            s"ragged embedding: got dim ${a.length}, expected $d")
          n += 1
          var i = 0; var idx = 0
          while (i < d) {
            s(i) = Math.addExact(s(i), a(i))
            var j = i
            while (j < d) {
              p(idx) = Math.addExact(p(idx), Math.multiplyExact(a(i), a(j)))
              idx += 1; j += 1
            }
            i += 1
          }
          if (n == FLUSH) flush()
        }
        add(first)
        while (it.hasNext) add(it.next())
        flush()
        out.iterator
      }
    }.toDF("i", "j", "pn", "ps_i", "ps_j", "ps_ij")
    partials.groupBy("i", "j")
      .agg(sum(col("pn")).as("n"),
        sum(col("ps_i").cast("decimal(38,0)")).as("s_i"),
        sum(col("ps_j").cast("decimal(38,0)")).as("s_j"),
        sum(col("ps_ij").cast("decimal(38,0)")).as("s_ij"))
      .withColumn("cov_num",
        col("n").cast("decimal(38,0)") * col("s_ij")
          - col("s_i") * col("s_j"))
  }

  /** Fitted PCA basis: `mean` in micro units, `components` row-major
    * (k rows of d), `eigenvalues` in micro² covariance units, both in
    * descending eigenvalue order with a deterministic sign convention
    * (largest-magnitude coordinate positive). */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                      components: Array[Array[Double]],
                      eigenvalues: Array[Double])

  /** Deterministic ±1 start component for the power iteration — the
    * [[Similarity.rpSign]] md5 coin under a pca-specific key, so a
    * start vector is never accidentally orthogonal to a data axis. */
  private def startSign(comp: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pca_${comp}_$i"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xF) < 8) 1.0 else -1.0
  }

  /** Fit the top-`k` principal components: collect the exact moment
    * rows (≤ d(d+1)/2 — the bounded-collect stance), assemble the
    * covariance matrix in doubles, and run `iters` rounds of power
    * iteration with Hotelling deflation per component. Deterministic:
    * exact moments in, fixed start vectors and iteration count, sign
    * fixed by the largest-magnitude coordinate. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
          k: Int, iters: Int = 50): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val rows = covMoments(vecs, idCol, vecCol).collect()
    require(rows.nonEmpty, "PCA fit needs a non-empty corpus")
    val n = rows.head.getAs[Long]("n")
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      val c = r.getAs[java.math.BigDecimal]("cov_num").doubleValue() /
        (n.toDouble * n.toDouble)
      cov(i)(j) = c
      cov(j)(i) = c
      if (i == j)
        mean(i) = r.getAs[java.math.BigDecimal]("s_i").doubleValue() / n
    }
    val comps = Array.ofDim[Double](k, dim)
    val eigs = new Array[Double](k)
    for (c <- 0 until k) {
      var v = Array.tabulate(dim)(startSign(c, _))
      for (_ <- 0 until iters) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => cov(i)(j) * v(j)).sum)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = if (nrm == 0) v else w.map(_ / nrm)
      }
      val lam = (0 until dim).map(i =>
        v(i) * (0 until dim).map(j => cov(i)(j) * v(j)).sum).sum
      // deterministic orientation: flip so the largest-|coord| is
      // positive (power iteration's sign is start-vector luck)
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v = v.map(-_)
      comps(c) = v
      eigs(c) = lam
      for (i <- 0 until dim; j <- 0 until dim)
        cov(i)(j) -= lam * v(i) * v(j)
    }
    PcaModel(dim, n, mean, comps, eigs)
  }

  /** Map-only projection onto a fitted basis: `proj` = array of
    * `(x_micro − mean)·v_c` per component, appended to the input
    * frame. The basis and the precomputed `mean·v_c` offsets ride the
    * plan as literals — zero exchanges, zero joins (asserted in
    * ScaleSpec), per-row double math so the result is
    * partitioning-independent. */
  def project(vecs: DataFrame, vecCol: String, model: PcaModel):
  DataFrame = {
    val comps: Seq[Seq[Double]] =
      model.components.map(_.toIndexedSeq).toIndexedSeq
    val offsets: Seq[Double] = model.components
      .map(v => v.indices.map(i => v(i) * model.mean(i)).sum)
      .toIndexedSeq
    val xd = transform(Similarity.toDouble(col(vecCol)),
      x => Similarity.microQuantize(x).cast("double"))
    Similarity.nonNullVecs(vecs, vecCol).withColumn("proj",
      zip_with(typedLit(comps), typedLit(offsets), (row, off) =>
        aggregate(zip_with(row, xd, (c, x) => c * x),
          lit(0.0d), _ + _) - off))
  }
}
