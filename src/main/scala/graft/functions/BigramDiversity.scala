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
  // open-addressing map buffers, REUSED per executor thread: the original
  // per-row allocation (two cap-sized long arrays, cap ≈ 2·|text|) made
  // this expression GC-bound at scale — ~64 KB of garbage per document is
  // 32 GB of allocation over a 500k-doc fixture, and x62's 10× step
  // measured 69× instead of ~10× purely from collector pressure. The
  // thread-local buffers grow geometrically to the largest document the
  // thread has seen; `used` records occupied slots so reset and the Σc²
  // fold are O(distinct), not O(cap).
  @transient private lazy val buffers: ThreadLocal[BigramDiversityHelper.Buf] =
    ThreadLocal.withInitial(() => new BigramDiversityHelper.Buf)

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    val buf = buffers.get()
    buf.ensure(n)
    val cap = buf.cap
    val keys = buf.keys
    val vals = buf.vals
    val used = buf.used
    var nUsed = 0
    var nBigrams = 0L
    var i = 0
    var prev = -1
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (prev >= 0) {
        nBigrams += 1
        // keys are the two codepoints packed into a Long (+1 so key 0
        // means "empty slot")
        val key = ((prev.toLong << 21) | cp.toLong) + 1L
        var slot = (java.lang.Long.hashCode(key * -7046029254386353131L) & (cap - 1))
        var done = false
        while (!done) {
          if (keys(slot) == 0L) {
            keys(slot) = key; vals(slot) = 1L
            used(nUsed) = slot; nUsed += 1
            done = true
          } else if (keys(slot) == key) {
            vals(slot) += 1L; done = true
          } else slot = (slot + 1) & (cap - 1)
        }
      }
      prev = cp
    }
    var sumSq = 0L
    var j = 0
    while (j < nUsed) {
      val slot = used(j)
      val c = vals(slot)
      sumSq += c * c
      keys(slot) = 0L // reset for the next row — O(distinct), not O(cap)
      vals(slot) = 0L
      j += 1
    }
    new GenericInternalRow(Array[Any](nBigrams, nUsed.toLong, sumSq))
  }
}

object BigramDiversityHelper {
  /** Per-thread reusable open-addressing buffers (see compute()). */
  private[functions] final class Buf {
    var cap: Int = 0
    var keys: Array[Long] = Array.emptyLongArray
    var vals: Array[Long] = Array.emptyLongArray
    var used: Array[Int] = Array.emptyIntArray
    def ensure(n: Int): Unit = {
      val need = java.lang.Integer.highestOneBit(math.max(16, n * 2 - 1)) * 2
      if (need > cap) {
        cap = need
        keys = new Array[Long](cap)
        vals = new Array[Long](cap)
      }
      if (used.length < math.max(1, n)) used = new Array[Int](math.max(1, n))
    }
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
