package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomMightContain, BpeEncode, BpeMergePass, DotProduct, MinHashBands, NfcNormalize, SimHash64, SqDist}

/** Standard config-time wiring for the engine's native functions:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Complements the runtime path (`GraftFunctions.register`) used when
  * the session already exists (e.g. the driver's harness session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
      (exprs: Seq[Expression]) => SqDist(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName,
        "graft_minhash_bands"),
      (exprs: Seq[Expression]) => MinHashBands.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_bloom_contains"),
      (exprs: Seq[Expression]) => BloomMightContain.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_bpe_merge"),
      new ExpressionInfo(classOf[BpeMergePass].getName, "graft_bpe_merge"),
      (exprs: Seq[Expression]) => BpeMergePass.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe_encode"),
      (exprs: Seq[Expression]) => BpeEncode.build(exprs)))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
