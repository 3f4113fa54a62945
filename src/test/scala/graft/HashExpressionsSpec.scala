package graft

import graft.functions.HashKernels
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native SimHash64 / MinHashBands expressions must produce the
  * exact values of the JVM kernels they wrap, and their use must not
  * re-introduce a ScalaUDF (codegen fence) into the dedup plans.
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    Seq("a", "b", "c"), Seq("x"), Seq("a", "a", "b"), Seq.empty[String])

  test("graft_simhash64 matches the Seq kernel") {
    val df = fixtures.toDF("toks")
    val got = df.select(Dedup.simhash64(col("toks"))).as[Long].collect().toSeq
    assert(got == fixtures.map(HashKernels.simhash64))
  }

  test("graft_minhash_bands matches the Seq kernel") {
    // registration must not depend on suite ordering (Dedup.simhash64
    // in the previous test registers as a side effect)
    graft.functions.GraftFunctions.register(spark)
    val df = fixtures.toDF("toks")
    val got = df.select(call_function("graft_minhash_bands",
        col("toks"), lit(8), lit(4))).as[Seq[Long]].collect().toSeq
    assert(got == fixtures.map(t =>
      HashKernels.minhashBands(t, 8, 4).toSeq))
  }

  test("graft_nfc composes decomposed sequences") {
    graft.functions.GraftFunctions.register(spark)
    val got = Seq("cafe\u0301", "caf\u00e9", "\u212B", "plain")
      .toDF("s")
      .select(call_function("graft_nfc", col("s"))).as[String]
      .collect().toSeq
    assert(got == Seq("caf\u00e9", "caf\u00e9", "\u00C5", "plain"))
  }

  test("native functions are callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val (sim, dot) = spark.sql(
      """SELECT graft_simhash64(split('a b c', ' ')),
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))""".stripMargin)
      .as[(Long, Double)].head()
    assert(sim == HashKernels.simhash64(Seq("a", "b", "c")))
    assert(dot == 11.0d)
  }

  test("dedup plans carry no ScalaUDF codegen fence") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_dedup_simhash", "q_dedup_simhash_banded",
                  "q_minhash_neardup")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("udf("),
        s"$q still plans a UDF:\n$plan")
    }
  }

  test("minhash signature null-propagates on a NULL token array") {
    // native nullSafeEval: a NULL token array yields a NULL signature,
    // never an NPE mid-job
    val df = Seq((1L, Some(Seq("a", "b"))), (2L, None))
      .toDF("id", "toks")
    val out = graft.operators.Dedup.minhashSignature(col("toks"), 8)
    val rows = df.select(col("id"), out.as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
  }

  test("native minhash signature matches the driver-side kernel and plans no UDF") {
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("b", "c", "d")))
      .toDF("id", "toks")
    val out = df.select(col("id"),
      graft.operators.Dedup.minhashSignature(col("toks"), 16).as("sig"))
    assert(!out.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "minhashSignature must be native codegen, not a ScalaUDF")
    val got = out.as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) ==
      graft.functions.HashKernels.minhash(Seq("a", "b", "c"), 16).toSeq)
    assert(got(2L) ==
      graft.functions.HashKernels.minhash(Seq("b", "c", "d"), 16).toSeq)
  }

  test("array-literal expressions compare by content (CSE-visible)") {
    // case-class reference equality on Array fields would make two
    // textually identical probes unequal to Catalyst, silently
    // defeating common-subexpression elimination
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val in = BoundReference(0, LongType, nullable = true)
    val a = graft.functions.BloomMightContain(in, Array(1L, 2L), 3)
    val b = graft.functions.BloomMightContain(in, Array(1L, 2L), 3)
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    assert(a != graft.functions.BloomMightContain(in, Array(1L, 3L), 3))
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val sin = BoundReference(0,
      org.apache.spark.sql.types.StringType, nullable = true)
    val e1 = graft.functions.BpeEncode(sin, Array(u("a")), Array(u("b")))
    val e2 = graft.functions.BpeEncode(sin, Array(u("a")), Array(u("b")))
    assert(e1 == e2 && e1.semanticEquals(e2))
    assert(e1 != graft.functions.BpeEncode(sin, Array(u("a")), Array(u("c"))))
  }
}
