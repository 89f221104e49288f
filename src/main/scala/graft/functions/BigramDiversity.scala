package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-bigram diversity statistics: bigram count, distinct
  * bigram count, and the collision sum Σc² (c = per-bigram frequency), as
  * one struct.
  *
  * Σc²/n² is the bigram collision probability — the exact, log-free
  * surrogate for Rényi-2 entropy (H₂ = −ln Σp²), and n²/Σc² is the
  * "effective alphabet size". Repetitive machine-generated text has a
  * small effective alphabet; natural text a large one. The catalog's
  * determinism discipline (see x44/x51) forbids ln() — libm last-ulp
  * rounding differs across engines — so the x62 gate publishes the exact
  * integer moments and one deterministic IEEE division, never a log.
  *
  * Why a custom Expression (the [[TextStats]] argument): the compositional
  * form is explode-all-bigrams → two hash aggregates — a full shuffle of
  * |text| rows per document. This fuses the whole computation into one
  * codepoint scan with a per-row open-addressing map, stays inside
  * whole-stage codegen, and shuffles nothing.
  *
  * Semantics contract (`BigramDiversitySpec` pins it against the
  * explode+groupBy formulation): bigrams are consecutive CODE POINT pairs
  * of the raw text (no lowering, no trimming), n_bigrams =
  * codepoint-length − 1 (0 for texts shorter than 2 codepoints).
  */
final class BigramDiversityHelper extends Serializable {
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // open-addressing map: keys are the two codepoints packed into a Long
    // (+1 so key 0 means "empty slot"); values are counts. Sized for the
    // worst case (every bigram distinct) once, then reused per row via
    // ThreadLocal-free local allocation — rows are small, allocation is
    // cheaper than false sharing.
    val cap = java.lang.Integer.highestOneBit(math.max(16, n * 2 - 1)) * 2
    val keys = new Array[Long](cap)
    val vals = new Array[Long](cap)
    var nBigrams = 0L
    var nDistinct = 0L
    var i = 0
    var prev = -1
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (prev >= 0) {
        nBigrams += 1
        val key = ((prev.toLong << 21) | cp.toLong) + 1L
        var slot = (java.lang.Long.hashCode(key * -7046029254386353131L) & (cap - 1))
        var done = false
        while (!done) {
          if (keys(slot) == 0L) {
            keys(slot) = key; vals(slot) = 1L; nDistinct += 1; done = true
          } else if (keys(slot) == key) {
            vals(slot) += 1L; done = true
          } else slot = (slot + 1) & (cap - 1)
        }
      }
      prev = cp
    }
    var sumSq = 0L
    var j = 0
    while (j < cap) {
      val c = vals(j)
      sumSq += c * c
      j += 1
    }
    new GenericInternalRow(Array[Any](nBigrams, nDistinct, sumSq))
  }
}

case class BigramDiversity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_diversity expects a string column, got $other")
  }

  override def dataType: DataType = BigramDiversity.schema

  private lazy val helper = new BigramDiversityHelper

  override def nullSafeEval(input: Any): Any =
    helper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj(
      "bigramDiversityHelper", helper, classOf[BigramDiversityHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramDiversity =
    copy(child = newChild)
}

object BigramDiversity {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  /** Column-API entry point. */
  def diversity(text: Column): Column =
    GraftBridge.column(BigramDiversity(GraftBridge.expression(text)))
}
