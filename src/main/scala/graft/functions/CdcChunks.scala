package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): split a text into variable-size chunks
  * whose boundaries depend only on local content, so chunk identity
  * survives insertions/deletions elsewhere in the document — the property
  * that makes chunk-level dedup robust where fixed-stride chunking (x30)
  * is not.
  *
  * Boundary rule: a cut lands AFTER codepoint position p (1-based,
  * p ≥ window) whenever the base-31 polynomial hash of the last `window`
  * codepoints ≡ 0 (mod `modulus`) — expected chunk length ≈ modulus.
  * Plain gear/Rabin CDC; the FastCDC min/max-size refinement is
  * deliberately absent: a min-size constraint makes each boundary depend
  * on the previous one (a sequential scan), while this rule is
  * position-local and therefore evaluable independently per position by
  * BOTH engines — the same per-position independence the DuckDB twin
  * exploits with a list_filter lambda.
  *
  * Why a custom Expression (the [[TextStats]] argument): the rolling scan
  * is one pass, allocation-bounded by the output chunks, and stays inside
  * whole-stage codegen; a higher-order-function formulation would run the
  * hash lambda interpreted per position and re-read the window 8×.
  *
  * Semantics contract (`CdcChunksSpec` pins the twin formulation):
  * positions/offsets count CODE POINTS; hash h(p) = Σ_{k=0..7}
  * cp(p−7+k)·31^(7−k) computed in exact Long arithmetic (max ≈ 2.4e17,
  * no overflow); empty text → empty array; texts shorter than `window`
  * → one chunk.
  */
final class CdcChunksHelper(window: Int, modulus: Int) extends Serializable {
  private val topPow: Long = {
    var p = 1L
    for (_ <- 1 until window) p *= 31L
    p // 31^(window-1)
  }

  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val ring = new Array[Int](window)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var cpIdx = 0
    var i = 0
    var chunkStart = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cpIdx >= window) h -= ring(cpIdx % window).toLong * topPow
      h = h * 31L + cp
      ring(cpIdx % window) = cp
      cpIdx += 1
      if (cpIdx >= window && h % modulus == 0 && i > chunkStart) {
        out += UTF8String.fromString(s.substring(chunkStart, i))
        chunkStart = i
      }
    }
    if (chunkStart < s.length)
      out += UTF8String.fromString(s.substring(chunkStart))
    new GenericArrayData(out.toArray)
  }
}

case class CdcChunks(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string column, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val helper = new CdcChunksHelper(window, modulus)

  override def nullSafeEval(input: Any): Any =
    helper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("cdcChunksHelper", helper, classOf[CdcChunksHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Column-API entry point; window/modulus default to 8/64 (≈64-char chunks). */
  def chunks(text: Column, window: Int = 8, modulus: Int = 64): Column =
    GraftBridge.column(CdcChunks(GraftBridge.expression(text), window, modulus))
}
