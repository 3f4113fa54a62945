package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Serializable rank-th-nearest-centroid kernel over a
  * TORRENT-BROADCAST quantizer — the streaming tense of the XL
  * transports in [[graft.operators.Similarity]]: the ingest door's
  * semantic gate must stay ROW-LOCAL (no object boundary, it composes
  * with the one allowed stateful op), but its plan-literal form pays
  * interpreted higher-order-lambda cost per centroid per row AND
  * carries the matrix in the plan. This kernel is the third transport:
  * a native codegen expression whose generated code calls ONE tight
  * JVM method, with the quantizer behind a broadcast handle that
  * serializes as bytes-sized task state.
  *
  * Both the interpreted `eval` and the generated code call the same
  * [[rankOf]], so the two execution paths cannot diverge. Scoring is
  * bit-identical to `centroidRankExpr` / the assignment folds for
  * vectors the quantizer can place: same index-order dot, same
  * zero-norm-denominator-first 0.0, same SQL NaN-largest ordering,
  * same score-desc/id-asc selection (ids must arrive sorted
  * ascending, the `ivfIndex` contract). A vector that scores null
  * against every centroid (null element, dim mismatch vs every
  * centroid) yields SQL NULL — the same unplaceable-vector stance as
  * `ivfTopKXL` (the literal form's comparator is undefined over null
  * scores and the door guards them upstream anyway).
  */
final class CentroidRankKernel(
    bc: Broadcast[(Array[Long], Array[Array[Double]], Array[Double])])
  extends Serializable {

  /** Marker for SQL NULL (no rank-th placeable centroid). */
  val NullSentinel: Long = Long.MinValue

  // SQL's total order on doubles: NaN greater than everything non-NaN
  private def gtSql(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b)
    else if (java.lang.Double.isNaN(b)) false
    else a > b

  def rankOf(vec: ArrayData, rank: Int): Long = {
    val (ids, mat, norms) = bc.value
    require(rank >= 1 && rank <= ids.length,
      s"centroid rank $rank out of range [1, ${ids.length}]")
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
    // rank rounds of first-max selection over the id-sorted order:
    // equal scores (incl. NaN==NaN, SQL-equal) keep the smaller id
    val taken = new Array[Boolean](ids.length)
    var round = 0
    var sel = -1
    while (round < rank) {
      sel = -1
      var selS = 0.0d
      var have = false
      k = 0
      while (k < ids.length) {
        if (!taken(k) && valid(k) && (!have || gtSql(scores(k), selS))) {
          sel = k; selS = scores(k); have = true
        }
        k += 1
      }
      if (sel >= 0) taken(sel) = true
      round += 1
    }
    if (sel >= 0) ids(sel) else NullSentinel
  }
}

/** The expression wrapper: `graft_centroid_rank(vec)` with the kernel
  * (and its broadcast handle) attached at construction — it cannot go
  * through the function registry (builders only receive Expressions),
  * so consumers build it via `GraftBridge.column`. See
  * [[CentroidRankKernel]] for semantics. */
case class CentroidRank(child: Expression, kernel: CentroidRankKernel,
                        rank: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_centroid_rank requires array<double>, got $t")
    }

  override def dataType: DataType = LongType

  // NULL on an unplaceable vector, even with a non-null child
  override def nullable: Boolean = true

  override def prettyName: String = "graft_centroid_rank"

  override def nullSafeEval(v: Any): Any = {
    val r = kernel.rankOf(v.asInstanceOf[ArrayData], rank)
    if (r == kernel.NullSentinel) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val kRef = ctx.addReferenceObj("graftCentroidRankKernel", kernel,
        classOf[CentroidRankKernel].getName)
      val r = ctx.freshName("r")
      s"""
         |long $r = $kRef.rankOf($v, $rank);
         |if ($r == Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
