package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-set token membership counts over a token array, in ONE scan.
  *
  * The composable form — one `size(filter(tk, t.isin(set: _*)))` per set —
  * walks the token array once per set on Catalyst's interpreted
  * higher-order-function path ([[TextStats]]' argument). For k stopword
  * sets that is k interpreted passes per row; language-ID style scoring
  * wants ONE pass consulting a hash index of all sets at once. Null
  * tokens count for no set (isin-over-null is null, which filter drops).
  *
  * Returns `array<long>` of length k, element i = hits of set i —
  * a token belonging to several sets counts once per set, exactly like
  * the per-set isin filters.
  */
final class TokenSetCountsHelper(sets: Array[Array[String]]) extends Serializable {
  @transient private lazy val idx: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for (si <- sets.indices; w <- sets(si)) {
      val k = UTF8String.fromString(w)
      val cur = m.get(k)
      m.put(k, if (cur == null) Array(si) else cur :+ si)
    }
    m
  }

  def compute(arr: ArrayData): ArrayData = {
    val counts = new Array[Long](sets.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hit = idx.get(arr.getUTF8String(i))
        if (hit != null) {
          var k = 0
          while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }
}

case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]]) extends UnaryExpression {
  require(sets.nonEmpty, "at least one token set required")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_counts expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val helper = new TokenSetCountsHelper(sets.map(_.toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    helper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("tokenSetCountsHelper", helper, classOf[TokenSetCountsHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
    copy(child = newChild)
}

object TokenSetCounts {
  /** Column-API entry point over a token-array column. */
  def counts(tokens: Column, sets: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenSetCounts(GraftBridge.expression(tokens), sets))
}
