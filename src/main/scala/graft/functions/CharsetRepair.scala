package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset detect-and-repair — the byte-level pass that belongs BETWEEN a
  * container walk (WARC/TAR payloads are bytes) and every text stage
  * (HTML extraction, NFC, tokenizers): real crawl bytes arrive as
  * windows-1252/latin-1 mojibake claiming to be UTF-8, and feeding them
  * to a lenient decoder silently replaces bytes with U+FFFD, splitting
  * dedup keys and corrupting token counts.
  *
  * Deterministic byte arithmetic, the decoder family's discipline:
  *   - STRICT RFC 3629 UTF-8 validation (no overlongs, no surrogates,
  *     no > U+10FFFF, no truncated tails — the checks lenient decoders
  *     skip). Valid input passes through UNTOUCHED (allocation-free:
  *     the UTF8String wraps the same bytes).
  *   - Invalid input is transcoded as windows-1252: 0x00–0x7F ASCII
  *     passthrough, 0x80–0x9F via the published cp1252 table (the five
  *     undefined positions 0x81/0x8D/0x8F/0x90/0x9D map to their C1
  *     controls, the WHATWG encoding-standard index — the web/crawl
  *     convention, information-preserving where the JDK's U+FFFD is
  *     lossy), 0xA0–0xFF as latin-1 (cp1252 is a superset of
  *     ISO-8859-1 outside the C1 range, so this one rule repairs both
  *     encodings).
  *
  * The CONFUSABLE case — bytes that validate as UTF-8 but are really
  * double-encoded mojibake ("Ã©" for "é") — is detectable AFTER decode
  * as the pair pattern [U+00C2 U+00C3][U+0080–U+00FF]; that detector is
  * a plain regexp over the repaired text (x214 pins it), not a second
  * code path here: repairing double-encoding automatically would corrupt
  * legitimate "Ã©" sequences, so the library flags, never rewrites.
  *
  * Both expressions are native codegen (SURVEY §4.2 preference order b)
  * via nullSafeCodeGen — narrow per-row work that composes into any scan
  * pipeline with zero shuffle.
  */
final class CharsetRepairHelper extends Serializable {

  /** cp1252 0x80–0x9F → Unicode (undefined positions = C1 controls),
    * from the published unicode.org CP1252.TXT mapping. */
  private val c1: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026',
    '\u2020', '\u2021', '\u02C6', '\u2030', '\u0160', '\u2039',
    '\u0152', '\u008D', '\u017D', '\u008F', '\u0090', '\u2018',
    '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D',
    '\u017E', '\u0178')

  /** Strict RFC 3629 validation over raw bytes. */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val x = b(i) & 0xff
      if (x < 0x80) i += 1
      else if (x < 0xc2) return false // continuation byte or overlong lead
      else if (x < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (x < 0xf0) { // 3-byte: overlongs and surrogates excluded
        if (i + 2 >= n) return false
        val b1 = b(i + 1) & 0xff
        val lo = if (x == 0xe0) 0xa0 else 0x80
        val hi = if (x == 0xed) 0x9f else 0xbf
        if (b1 < lo || b1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (x < 0xf5) { // 4-byte: planes 1–16 only
        if (i + 3 >= n) return false
        val b1 = b(i + 1) & 0xff
        val lo = if (x == 0xf0) 0x90 else 0x80
        val hi = if (x == 0xf4) 0x8f else 0xbf
        if (b1 < lo || b1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false // 0xF5–0xFF never legal
    }
    true
  }

  def isUtf8(b: Array[Byte]): Boolean = isValidUtf8(b)

  /** Valid UTF-8 passes through (no copy); everything else transcodes as
    * windows-1252 (⊇ latin-1 outside C1). */
  def repair(b: Array[Byte]): UTF8String = {
    if (isValidUtf8(b)) return UTF8String.fromBytes(b)
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (x < 0x80) sb.append(x.toChar)
      else if (x < 0xa0) sb.append(c1(x - 0x80))
      else sb.append(x.toChar) // latin-1: byte value IS the code point
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class CharsetRepair(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"charset_repair expects binary, got $other")
  }

  override def dataType: DataType = StringType

  private lazy val helper = new CharsetRepairHelper

  override def nullSafeEval(input: Any): Any =
    helper.repair(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("charsetHelper", helper,
      classOf[CharsetRepairHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.repair($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharsetRepair =
    copy(child = newChild)
}

case class IsValidUtf8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"is_valid_utf8 expects binary, got $other")
  }

  override def dataType: DataType = BooleanType

  private lazy val helper = new CharsetRepairHelper

  override def nullSafeEval(input: Any): Any =
    helper.isUtf8(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("charsetHelper", helper,
      classOf[CharsetRepairHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.isUtf8($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): IsValidUtf8 =
    copy(child = newChild)
}

object CharsetRepair {
  /** Repaired text of raw crawl bytes (UTF-8 passthrough / cp1252 transcode). */
  def repair(c: Column): Column =
    GraftBridge.column(CharsetRepair(GraftBridge.expression(c)))

  /** Strict RFC 3629 validity of raw bytes. */
  def isUtf8(c: Column): Column =
    GraftBridge.column(IsValidUtf8(GraftBridge.expression(c)))

  /** The double-encoding confusable pattern over REPAIRED text: a C1-page
    * lead (Â/Ã) followed by a Latin-1-page char — the fingerprint of
    * UTF-8 bytes decoded as 1252 and re-encoded. Flag, never rewrite. */
  val mojibakePairPattern: String = "[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00FF}]"
}
