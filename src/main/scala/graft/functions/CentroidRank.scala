package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Serializable top-`nProbe`-centroid kernel over a TORRENT-BROADCAST
  * quantizer — the streaming tense of the XL transports in
  * [[graft.operators.Similarity]]: the ingest door's semantic gate
  * must stay ROW-LOCAL (no object boundary, it composes with the one
  * allowed stateful op), but its plan-literal form pays interpreted
  * higher-order-lambda cost per centroid per row AND carries the
  * matrix in the plan. This kernel is the third transport: a native
  * codegen expression whose generated code calls ONE tight JVM
  * method, with the quantizer behind a broadcast handle that
  * serializes as bytes-sized task state.
  *
  * The kernel returns ALL probe ranks in one pass (an array of the
  * top-`nProbe` centroid ids): the door references `rank p` as a
  * `try_element_at`, so K centroids are scored ONCE per arrival, not
  * once per probe rank, and there is no in-band id sentinel — a
  * vector the quantizer cannot place yields a SHORT (possibly empty)
  * array, whose missing elements read as SQL NULL at the consumer.
  *
  * Both the interpreted `eval` and the generated code call the same
  * [[ranksOf]], so the two execution paths cannot diverge. Scoring
  * and ordering are bit-identical to `centroidRankExpr` for vectors
  * the quantizer can place: same index-order dot, same
  * zero-norm-denominator-first 0.0, same SQL NaN-largest ordering
  * (shared [[graft.operators.Similarity.gtSqlDouble]] — one
  * definition, not a copy), same score-desc/id-asc selection (ids
  * must arrive sorted ascending, the `ivfIndex` contract).
  */
final class CentroidRankKernel(
    bc: Broadcast[(Array[Long], Array[Array[Double]], Array[Double])])
  extends Serializable {

  def nCentroids: Int = bc.value._1.length

  /** Top-`nProbe` placeable centroid ids, best first; shorter than
    * `nProbe` when fewer centroids are placeable for this vector. */
  def ranksOf(vec: ArrayData, nProbe: Int): Array[Long] = {
    val (ids, mat, norms) = bc.value
    val n = vec.numElements()
    val scores = new Array[Double](ids.length)
    val valid = new Array[Boolean](ids.length)
    var k = 0
    while (k < ids.length) {
      val c = mat(k)
      if (norms(k) == 0.0d) { scores(k) = 0.0d; valid(k) = true }
      else if (c.length == n) {
        var s = 0.0d
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (vec.isNullAt(i)) ok = false
          else { s += vec.getDouble(i) * c(i); i += 1 }
        }
        if (ok) { scores(k) = s / norms(k); valid(k) = true }
      }
      k += 1
    }
    // nProbe rounds of first-max selection over the id-sorted order:
    // equal scores (incl. NaN==NaN, SQL-equal) keep the smaller id
    val out = new Array[Long](nProbe)
    var found = 0
    var round = 0
    while (round < nProbe) {
      var sel = -1
      var selS = 0.0d
      var have = false
      k = 0
      while (k < ids.length) {
        if (valid(k) && (!have ||
            graft.operators.Similarity.gtSqlDouble(scores(k), selS))) {
          sel = k; selS = scores(k); have = true
        }
        k += 1
      }
      if (sel >= 0) {
        valid(sel) = false // taken
        out(found) = ids(sel); found += 1
      }
      round += 1
    }
    if (found == nProbe) out else java.util.Arrays.copyOf(out, found)
  }
}

/** The expression wrapper: `graft_centroid_ranks(vec)` with the
  * kernel (and its broadcast handle) attached at construction — it
  * cannot go through the function registry (builders only receive
  * Expressions), so consumers build it via `GraftBridge.column`. See
  * [[CentroidRankKernel]] for semantics. `nProbe` is validated at
  * construction (driver plan-build time), not per row. */
case class CentroidRanks(child: Expression, kernel: CentroidRankKernel,
                         nProbe: Int)
  extends UnaryExpression {

  require(nProbe >= 1 && nProbe <= kernel.nCentroids,
    s"nProbe $nProbe out of range [1, ${kernel.nCentroids}]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_centroid_ranks requires array<double>, got $t")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_centroid_ranks"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      kernel.ranksOf(v.asInstanceOf[ArrayData], nProbe))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val kRef = ctx.addReferenceObj("graftCentroidRankKernel", kernel,
        classOf[CentroidRankKernel].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util
         |    .GenericArrayData($kRef.ranksOf($v, $nProbe));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
