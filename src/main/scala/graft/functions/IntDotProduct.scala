package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two long-vector columns — the scoring
  * primitive of QUANTIZED similarity search (int8 embeddings: x33
  * quantizes, x128 evaluates recall impact). Same rationale as
  * [[CosineSimilarity]] (SURVEY.md §4.2 preference order b): the
  * composable `aggregate(zip_with(...))` form is CodegenFallback
  * (interpreted, allocates per row); this is one fused whole-stage-codegen
  * loop. Integer arithmetic end to end, so results are EXACT and the
  * cross-engine oracle needs no float-parity care at all.
  *
  * Null if either side is null, or if any scored element is null — the
  * same result the composable `aggregate(zip_with(...))` form (and the
  * DuckDB oracle) produces, so quantized pipelines can swap forms without
  * a semantics change. Length mismatch scores the common prefix (the
  * CosineSimilarity contract).
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot expects (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable(left) || elemsNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      // ev.isNull is declared (and pre-set false) by nullSafeCodeGen; when
      // the expression is non-nullable it is the literal `false` and must
      // not be assigned — but then the schema forbids null elements anyway.
      val nullElemCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElemCheck
         |  $dot += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  /** Column-API entry point. */
  def intDot(a: Column, b: Column): Column =
    GraftBridge.column(IntDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
