package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * text-cleaning pass of every multilingual corpus pipeline (the same
  * logical token arrives precomposed from one crawl source and decomposed
  * from another; un-normalized text silently splits dedup keys, vocab
  * entries, and group-bys that should collide).
  *
  * Why a custom Expression (SURVEY.md §4.2 preference order b): Spark
  * ships no normalization function, so the alternatives are a Scala UDF
  * (serialization boundary, no codegen, null handling by hand) or
  * shipping text through Python. This stays inside whole-stage codegen
  * via nullSafeCodeGen and keeps the hot path allocation-free for text
  * that is ALREADY normalized — `Normalizer.isNormalized` is a scan-only
  * check (true for virtually all real-world text, and trivially true for
  * pure ASCII via the quick-check property), in which case the input
  * UTF8String is returned as-is and nothing is copied or re-encoded.
  *
  * Semantics: exactly `java.text.Normalizer.normalize(s, NFC)` — the
  * Unicode standard canonical composition (UAX #15), which is also what
  * DuckDB's `nfc_normalize` (utf8proc) implements; x190 pins the two
  * engines against each other over precomposed/decomposed Latin and
  * Hangul-jamo constructions.
  */
final class NfcNormalizeHelper extends Serializable {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $other")
  }

  override def dataType: DataType = StringType

  private lazy val helper = new NfcNormalizeHelper

  override def nullSafeEval(input: Any): Any =
    helper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("nfcHelper", helper, classOf[NfcNormalizeHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point. */
  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
