package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence LENGTH of two token arrays — the kernel of
  * ROUGE-L (Lin 2004) and of alignment-style eval metrics generally.
  *
  * Why a custom Expression (SURVEY.md §4.2 preference order b): the
  * higher-order-function formulation (`aggregate` over the candidate with
  * a `transform` per ref cell) runs on Catalyst's interpreted HOF path
  * AND pays an extra inner `transform(sequence(1, j), …)` scan per cell —
  * O(ref · cand · j) with per-cell array allocation. This is the textbook
  * O(ref · cand) two-row dynamic program — `dp[i][j] =
  * ref[j]==cand[i] ? prev[j-1]+1 : max(prev[j], cur[j-1])` — fused into
  * one codegen'd loop with two reusable long rows and zero per-cell
  * allocation: the shape a corpus-wide eval sweep needs.
  *
  * Null token elements never match anything (the x183 pipelines filter
  * them out before the DP; the contract here just keeps the kernel total).
  * Result is null iff either array is null.
  */
final class LcsLengthHelper extends Serializable {
  def compute(refA: ArrayData, candA: ArrayData): Long = {
    val n = refA.numElements()
    val m = candA.numElements()
    if (n == 0 || m == 0) return 0L
    val ref = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      ref(j) = if (refA.isNullAt(j)) null else refA.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Long](n + 1)
    var cur = new Array[Long](n + 1)
    var i = 0
    while (i < m) {
      val t = if (candA.isNullAt(i)) null else candA.getUTF8String(i)
      var k = 1
      while (k <= n) {
        val r = ref(k - 1)
        cur(k) =
          if (t != null && r != null && t.equals(r)) prev(k - 1) + 1L
          else math.max(prev(k), cur(k - 1))
        k += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      cur(0) = 0L
      i += 1
    }
    prev(n)
  }
}

/** `bigint` LCS length over two `array<string>` columns (codegen). */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(_: StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_length expects (array<string>, array<string>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val helper = new LcsLengthHelper

  override def nullSafeEval(a: Any, b: Any): Any =
    helper.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("lcsHelper", helper, classOf[LcsLengthHelper].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $h.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Column-API entry point. */
  def lcs(ref: Column, cand: Column): Column =
    GraftBridge.column(LcsLength(
      GraftBridge.expression(ref), GraftBridge.expression(cand)))
}
