package graft

import graft.operators.ModelFit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-OLS model fit (the train half of the quality filter).
  * q_text_quality_fit / q_text_quality_distill are oracle-checked
  * end-to-end; this spec pins the solver itself: exact quantization,
  * exact determinants, exact recovery of a noiseless linear generator,
  * partitioning invariance of the artifact, and the degenerate-input
  * guard.
  */
class ModelFitSpec extends SparkSpec {

  import ModelFit.{det, quantize}

  test("quantize rounds half away from zero, exactly, both signs") {
    // 1/2 at scale 1 -> 1; -1/2 -> -1 (half away from zero)
    assert(quantize(BigInt(1), BigInt(2), 1L) == 1L)
    assert(quantize(BigInt(-1), BigInt(2), 1L) == -1L)
    // 1/3 at Q4 = 3333.33 -> 3333; 2/3 -> 6667
    assert(quantize(BigInt(1), BigInt(3), 10000L) == 3333L)
    assert(quantize(BigInt(2), BigInt(3), 10000L) == 6667L)
    assert(quantize(BigInt(-2), BigInt(3), 10000L) == -6667L)
    assert(quantize(BigInt(0), BigInt(7), 10000L) == 0L)
    // exact integers stay exact
    assert(quantize(BigInt(42), BigInt(6), 10000L) == 70000L)
    intercept[IllegalArgumentException](quantize(BigInt(1), BigInt(0), 1L))
    intercept[IllegalArgumentException](quantize(BigInt(1), BigInt(-2), 1L))
  }

  test("det: cofactor expansion matches hand-computed 2x2 and 3x3") {
    assert(det(Vector(Vector(BigInt(5)))) == BigInt(5))
    assert(det(Vector(
      Vector(BigInt(1), BigInt(2)),
      Vector(BigInt(3), BigInt(4)))) == BigInt(-2))
    // det [[2,0,1],[1,3,2],[1,1,1]] = 2*(3-2) - 0 + 1*(1-3) = 0
    assert(det(Vector(
      Vector(BigInt(2), BigInt(0), BigInt(1)),
      Vector(BigInt(1), BigInt(3), BigInt(2)),
      Vector(BigInt(1), BigInt(1), BigInt(1)))) == BigInt(0))
    assert(det(Vector(
      Vector(BigInt(6), BigInt(1), BigInt(1)),
      Vector(BigInt(4), BigInt(-2), BigInt(5)),
      Vector(BigInt(2), BigInt(8), BigInt(7)))) == BigInt(-306))
  }

  // noiseless generator y = 3 + 2*f1 - f2 over a non-collinear grid
  private def planeDf: DataFrame = {
    val rows = for (f1 <- 0L to 4L; f2 <- 0L to 3L)
      yield (f1, f2, 3L + 2L * f1 - f2)
    spark.createDataFrame(rows).toDF("f1", "f2", "y")
  }

  test("solve recovers a noiseless linear generator exactly") {
    val w = ModelFit.fitWeightsQ4(planeDf,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"))
    assert(w == Seq(30000L, 20000L, -10000L),
      s"expected exact Q4 recovery of (3, 2, -1), got $w")
  }

  test("artifact row carries exact moments plus the fitted weights") {
    val art = ModelFit.fitLinearQ4(planeDf,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y")).head()
    val n = 20L
    assert(art.getAs[Long]("n") == n)
    // moments of the 5x4 grid, computed by hand:
    // sum f1 = 4*(0+1+2+3+4) = 40; sum f2 = 5*(0+1+2+3) = 30
    assert(art.getAs[Long]("s_f1") == 40L)
    assert(art.getAs[Long]("s_f2") == 30L)
    // sum f1^2 = 4*30 = 120; sum f2^2 = 5*14 = 70; sum f1*f2 = 40*30/20
    assert(art.getAs[Long]("s_f1_f1") == 120L)
    assert(art.getAs[Long]("s_f2_f2") == 70L)
    assert(art.getAs[Long]("s_f1_f2") == 60L)
    // sum y = 20*3 + 2*40 - 30 = 110
    assert(art.getAs[Long]("s_y") == 110L)
    assert(art.getAs[Long]("w_bias_q4") == 30000L)
    assert(art.getAs[Long]("w_f1_q4") == 20000L)
    assert(art.getAs[Long]("w_f2_q4") == -10000L)
  }

  test("artifact is invariant under repartitioning (exact sums)") {
    val base = ModelFit.fitLinearQ4(planeDf,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y")).head()
    for (p <- Seq(1, 3, 7)) {
      val r = ModelFit.fitLinearQ4(planeDf.repartition(p),
        Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y")).head()
      assert(r == base, s"artifact differs at $p partitions")
    }
  }

  test("collinear features fail fast instead of emitting garbage") {
    val df = planeDf.withColumn("f2", col("f1") * 2L)
    val e = intercept[IllegalArgumentException] {
      ModelFit.fitLinearQ4(df,
        Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"))
    }
    assert(e.getMessage.contains("collinear"))
  }

  test("empty input fails fast") {
    intercept[IllegalArgumentException] {
      ModelFit.fitLinearQ4(planeDf.filter(lit(false)),
        Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"))
    }
  }

  test("single-feature fit solves the 2x2 system exactly") {
    // y = -5 + 7*f over f in 0..6 (14 rows, duplicated to vary counts)
    val rows = (0L to 6L).flatMap(f => Seq((f, -5L + 7L * f), (f, -5L + 7L * f)))
    val df = spark.createDataFrame(rows).toDF("f", "y")
    val w = ModelFit.fitWeightsQ4(df, Seq("f" -> col("f")), col("y"))
    assert(w == Seq(-50000L, 70000L))
  }

  test("quantization matches the DuckDB truncating-division form") {
    // the oracle writes (2*num*S + sign(num)*det) // (2*det) with //
    // truncating toward zero; BigInt / also truncates toward zero —
    // sweep sign/magnitude combinations to pin the equivalence
    for (num <- -17L to 17L; d <- Seq(3L, 7L, 10L)) {
      val expected = { // independent reference: round half away on the rational
        val exact = BigDecimal(num) * 10000 / d
        exact.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      }
      assert(quantize(BigInt(num), BigInt(d), 10000L) == expected,
        s"num=$num det=$d")
    }
  }
}
