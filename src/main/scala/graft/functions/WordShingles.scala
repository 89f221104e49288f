package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles from a token array, as one fused codegen pass.
  *
  * Why a custom Expression ([[TextStats]]' argument, SURVEY.md §4.2
  * preference order b): the composable form —
  * `transform(sequence(0, size(tk) - n), i -> concat_ws(' ', tk[i], …))`
  * — evaluates the lambda on Catalyst's INTERPRETED path (CodegenFallback)
  * for every shingle of every document, and it sits under the explode
  * feeding EVERY shingle-indexed operator in the catalog (MinHash
  * signatures, n-gram Jaccard/containment, novelty, decontamination, span
  * dedup). This expression emits the same strings from a single
  * while-loop inside whole-stage codegen.
  *
  * Semantics contract (pinned by `WordShinglesSpec` against the lambda
  * form on its guarded domain): for `size(tk) >= n` the output is
  * identical — element i is `concat_ws(' ', tk[i..i+n-1])` with null
  * tokens skipped (concat_ws semantics). For `size(tk) < n` the lambda
  * form is UNDEFINED under ANSI mode (its descending `sequence` indexes
  * the array at −1), which is why every call site guards
  * `size(tk) >= n`; this expression returns an EMPTY array there — the
  * sane library semantics for short documents.
  */
final class WordShinglesHelper(n: Int) extends Serializable {
  private val sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val helper = new WordShinglesHelper(n)

  override def nullSafeEval(input: Any): Any =
    helper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("wordShinglesHelper", helper, classOf[WordShinglesHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column-API entry point over a token-array column. */
  def shingles(tokens: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(tokens), n))
}
