package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Model-TRAIN step of the linear quality filter — the counterpart of
  * [[TextAnalysis.linearModelQ8]] (which applies a frozen artifact).
  * Together they close the loop curation pipelines actually run: fit a
  * cheap linear proxy of an expensive signal (here the bigram-LM
  * log-likelihood) on heuristic features, then apply it at scan speed
  * over the full corpus.
  *
  * The fit is ordinary least squares via the normal equations, kept
  * ENGINE-EXACT end to end:
  *
  *  - Features and the target arrive as integer fixed-point columns
  *    (Q4 features, any integer unit for y). The moment sums — n,
  *    Σf_i, Σf_i·f_j, Σy, Σf_i·y — are exact BIGINT sums of integer
  *    products: ONE map-side-combinable aggregate, no window, no
  *    shuffle beyond the k(k+3)/2+2-value reduce, and the result is
  *    partitioning-independent by construction. At 100 TB this is a
  *    single corpus scan reducing to O(k²) numbers.
  *  - The (k+1)×(k+1) system is solved on the driver by Cramer's rule
  *    over BigInt — exact rational arithmetic, no float linear algebra,
  *    so the fitted weights are a pure function of the moment sums.
  *  - Weights are quantized to Q4 by round-half-away-from-zero, which
  *    both Scala BigInt division (truncating) and the DuckDB oracle's
  *    `//` (also truncating) express identically:
  *    `(2·num·S ± det) / (2·det)`.
  *
  * The driver-side solve collects exactly one row of O(k²) longs — the
  * same bounded-collect stance as k-means' k·dim partials.
  */
object ModelFit {

  /** Quantization scale of the fitted weights (Q4 — the
    * [[TextAnalysis.linearModelQ8]] convention). */
  val WeightScale = 10000L

  /** Exact round-half-away-from-zero of the rational num·scale/det,
    * via truncating BigInt division (det must be positive). */
  private[graft] def quantize(num: BigInt, det: BigInt,
                                  scale: Long): Long = {
    require(det.signum > 0, "quantize needs det > 0")
    val n2 = num * scale * 2
    val adj = if (n2.signum < 0) -det else det
    ((n2 + adj) / (det * 2)).toLong
  }

  /** Exact determinant by cofactor expansion — k here is the feature
    * count + 1 (tiny), so O(k!) is irrelevant and exactness is free. */
  private[graft] def det(m: Vector[Vector[BigInt]]): BigInt =
    if (m.size == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(row =>
        row.zipWithIndex.collect { case (v, c) if c != j => v })
      val s = if (j % 2 == 0) BigInt(1) else BigInt(-1)
      s * m(0)(j) * det(minor)
    }.sum

  /** Solve the intercept-augmented normal equations exactly.
    *
    * @param n      row count
    * @param sF     Σf_i (length k)
    * @param sFF    Σf_i·f_j as a full symmetric k×k matrix
    * @param sY     Σy
    * @param sFY    Σf_i·y (length k)
    * @return Q4 coefficients, intercept first — coefficient c maps the
    *         Q4 feature column to y-units·Q4 (apply with
    *         [[TextAnalysis.linearModelQ8]]; divide by 1e4 for y units)
    */
  def solveQ4(n: Long, sF: Seq[Long], sFF: Seq[Seq[Long]], sY: Long,
              sFY: Seq[Long]): Seq[Long] = {
    val k = sF.size
    require(sFF.size == k && sFF.forall(_.size == k) && sFY.size == k,
      s"moment shapes inconsistent with k=$k")
    // Gram of [1, f_1..f_k] and the matching right-hand side
    val g = Vector.tabulate(k + 1, k + 1) {
      case (0, 0) => BigInt(n)
      case (0, j) => BigInt(sF(j - 1))
      case (i, 0) => BigInt(sF(i - 1))
      case (i, j) => BigInt(sFF(i - 1)(j - 1))
    }
    val b = (BigInt(sY) +: sFY.map(BigInt(_))).toVector
    val d = det(g)
    require(d.signum > 0,
      s"normal equations are singular or indefinite (det=$d): " +
        "features are collinear or the input is empty/degenerate")
    (0 to k).map { i =>
      val gi = g.zipWithIndex.map { case (row, r) =>
        row.updated(i, b(r))
      }
      quantize(det(gi), d, WeightScale)
    }
  }

  /** Fit y on the given Q4 feature columns (with intercept) and return
    * a ONE-ROW artifact DataFrame carrying the exact moment sums and
    * the fitted Q4 weights: `n, s_<name>, s_<ni>_<nj>, s_y, s_<ni>_y,
    * w_bias_q4, w_<name>_q4`. The moments make the fit auditable (and
    * oracle-checkable); the weights are the deployable artifact.
    */
  /** The exact moment reduce as a one-row DataFrame — the only pass
    * over the data. Exposed so plan tests (and callers auditing the
    * fit) see the operator's real aggregate, not a reconstruction. */
  def momentsDf(df: DataFrame, features: Seq[(String, Column)],
                y: Column): DataFrame = {
    require(features.nonEmpty, "moments need at least one feature")
    val k = features.size
    val names = features.map(_._1)
    require(names.distinct.size == k, "feature names must be unique")
    val fcols = features.map(_._2)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      names.zip(fcols).map { case (nm, c) => sum(c).as(s"s_$nm") } ++
      (for (i <- 0 until k; j <- i until k) yield
        sum(fcols(i) * fcols(j)).as(s"s_${names(i)}_${names(j)}")) ++
      Seq(sum(y).as("s_y")) ++
      names.zip(fcols).map { case (nm, c) => sum(c * y).as(s"s_${nm}_y") }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def fitLinearQ4(df: DataFrame, features: Seq[(String, Column)],
                  y: Column): DataFrame = {
    val k = features.size
    val names = features.map(_._1)
    val row = momentsDf(df, features, y).head()
    def lv(c: String): Long = row.getAs[Long](c)
    val n = lv("n")
    val sF = names.map(nm => lv(s"s_$nm"))
    val sFF = Seq.tabulate(k, k) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      lv(s"s_${names(a)}_${names(b)}")
    }
    val w = solveQ4(n, sF, sFF, lv("s_y"), sFY = names.map(nm => lv(s"s_${nm}_y")))
    val outNames = row.schema.fieldNames ++
      ("w_bias_q4" +: names.map(nm => s"w_${nm}_q4"))
    val outVals = row.toSeq.map(_.asInstanceOf[Long]) ++ w
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.List.of(Row(outVals: _*)),
      StructType(outNames.map(StructField(_, LongType, nullable = false))))
  }

  /** The fitted weights alone, intercept first — for feeding
    * [[TextAnalysis.linearModelQ8]] without re-reading the artifact
    * row's moment columns. */
  def fitWeightsQ4(df: DataFrame, features: Seq[(String, Column)],
                   y: Column): Seq[Long] = {
    val art = fitLinearQ4(df, features, y).head()
    val names = features.map(_._1)
    art.getAs[Long]("w_bias_q4") +:
      names.map(nm => art.getAs[Long](s"w_${nm}_q4"))
  }
}
