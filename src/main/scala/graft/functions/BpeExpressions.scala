package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels (Sennrich et al. 2016 — the tokenizer
  * trained by every LLM data pipeline). Two one-pass JVM primitives
  * behind native codegen expressions:
  *
  *  - mergePass: ONE left-to-right non-overlapping replacement of an
  *    adjacent symbol pair — the inner step of training, applied to
  *    the word-frequency table each round;
  *  - encode: a word's char sequence folded through the full learned
  *    merge list in rank order — the apply step, run once per
  *    DISTINCT word and broadcast back to the corpus (operators.Bpe).
  *
  * Everything is UTF8String-native: no deserialize-to-Seq boundary,
  * no ScalaUDF codegen fence.
  */
object BpeKernels {

  /** One non-overlapping left-to-right merge of (l, r) -> l+r. */
  def mergePass(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return syms
    val out = new Array[AnyRef](n)
    var i = 0
    var o = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(l) &&
          l != null && {
            val nxt = syms.getUTF8String(i + 1)
            nxt != null && nxt.equals(r)
          }) {
        out(o) = UTF8String.concat(cur, syms.getUTF8String(i + 1))
        i += 2
      } else {
        out(o) = cur
        i += 1
      }
      o += 1
    }
    if (o == n) syms
    else new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  /** Split a word into single-codepoint symbols. */
  def chars(word: UTF8String): ArrayData = {
    val s = word.toString
    val out = new Array[AnyRef](s.codePointCount(0, s.length))
    var i = 0
    var o = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val next = i + Character.charCount(cp)
      out(o) = UTF8String.fromString(s.substring(i, next))
      i = next
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Fold a word through the merge list in rank order. */
  def encode(word: UTF8String, lefts: Array[UTF8String],
             rights: Array[UTF8String]): ArrayData = {
    var syms = chars(word)
    var m = 0
    while (m < lefts.length && syms.numElements() >= 2) {
      syms = mergePass(syms, lefts(m), rights(m))
      m += 1
    }
    syms
  }
}

/** `graft_bpe_merge(syms, l, r)`: one training-round merge pass over a
  * symbol-array column; l/r are plan-time string literals (the round's
  * winning pair). */
object BpeMergePass {
  def build(exprs: Seq[Expression]): BpeMergePass = {
    require(exprs.length == 3,
      "graft_bpe_merge(syms, left, right) takes 3 args")
    def strArg(e: Expression, what: String): UTF8String = {
      require(e.foldable, s"$what must be a string literal")
      e.eval() match {
        case s: UTF8String => s
        case other => throw new IllegalArgumentException(
          s"$what must be a string literal, got $other")
      }
    }
    BpeMergePass(exprs.head, strArg(exprs(1), "left"),
      strArg(exprs(2), "right"))
  }
}

case class BpeMergePass(child: Expression, left: UTF8String,
                        right: UTF8String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if left != null && right != null =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      "graft_bpe_merge requires non-null left/right literals")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_merge requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bpe_merge"

  override def nullSafeEval(a: Any): Any =
    BpeKernels.mergePass(a.asInstanceOf[ArrayData], left, right)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", left,
      classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeRight", right,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      a => s"graft.functions.BpeKernels.mergePass($a, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `graft_bpe_encode(word, lefts, rights)`: tokenize one word with the
  * full learned merge table (two parallel foldable array<string>
  * literals, rank order), decoded ONCE at plan time into UTF8String
  * arrays the generated code references directly. */
object BpeEncode {
  def build(exprs: Seq[Expression]): BpeEncode = {
    require(exprs.length == 3,
      "graft_bpe_encode(word, lefts, rights) takes 3 args")
    def arrArg(e: Expression, what: String): Array[UTF8String] = {
      require(e.foldable, s"$what must be an array<string> literal")
      e.eval() match {
        case a: ArrayData =>
          val out = new Array[UTF8String](a.numElements())
          var i = 0
          while (i < out.length) {
            out(i) = a.getUTF8String(i)
            require(out(i) != null, s"$what must not contain nulls")
            i += 1
          }
          out
        case other => throw new IllegalArgumentException(
          s"$what must evaluate to array<string>, got $other")
      }
    }
    val lefts = arrArg(exprs(1), "lefts")
    val rights = arrArg(exprs(2), "rights")
    require(lefts.length == rights.length,
      "lefts and rights must be the same length")
    BpeEncode(exprs.head, lefts, rights)
  }
}

case class BpeEncode(child: Expression, lefts: Array[UTF8String],
                     rights: Array[UTF8String]) extends UnaryExpression {

  // content equality for the Array fields (see BloomMightContain):
  // reference equality would defeat Catalyst subexpression
  // elimination for repeated encodes over the same merge table
  override def equals(other: Any): Boolean = other match {
    case BpeEncode(c, l, r) => c == child &&
      java.util.Arrays.equals(
        l.asInstanceOf[Array[AnyRef]], lefts.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(
        r.asInstanceOf[Array[AnyRef]], rights.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    java.lang.Integer.valueOf(
      java.util.Arrays.hashCode(lefts.asInstanceOf[Array[AnyRef]])),
    java.lang.Integer.valueOf(
      java.util.Arrays.hashCode(rights.asInstanceOf[Array[AnyRef]])))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires a string word, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(a: Any): Any =
    BpeKernels.encode(a.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = s"${classOf[UTF8String].getName}[]"
    val lRef = ctx.addReferenceObj("bpeLefts", lefts, cls)
    val rRef = ctx.addReferenceObj("bpeRights", rights, cls)
    defineCodeGen(ctx, ev,
      a => s"graft.functions.BpeKernels.encode($a, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
