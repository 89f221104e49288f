package graft.functions

import java.text.Normalizer

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NfcNormalize (x190) against the JDK reference on the sequences that
  * matter: Latin combining marks, Hangul jamo composition, non-BMP text,
  * already-normalized fast path, nulls, and group-key collision. All
  * non-ASCII is spelled in unicode escapes so composed vs decomposed is
  * unambiguous in the source.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val precomposedCafe = "caf\u00e9"    // e-acute precomposed
  private val decomposedCafe  = "cafe\u0301"   // e + combining acute U+0301

  private val cases = Seq(
    "plain ascii stays",
    precomposedCafe,
    decomposedCafe,
    "A\u030aring",                     // A + ring above -> U+00C5
    "\u1100\u1161\u11a8 jamo",                     // Hangul jamo -> U+AC01
    "\uac01 precomposed hangul",
    s"mixed $precomposedCafe and $decomposedCafe",
    "emoji \ud83d\ude00 survives",                    // non-BMP passthrough
    "o\u0308\u0301 multi-mark",                    // diaeresis + acute
    "")

  test("matches java.text.Normalizer NFC on all cases") {
    val got = cases.toDF("s")
      .select(col("s"), NfcNormalize.nfc(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      assert(got(c) == Normalizer.normalize(c, Normalizer.Form.NFC), s"case '$c'")
    }
  }

  test("already-NFC input is returned unchanged (fast path, no copy)") {
    val h = new NfcNormalizeHelper
    val in = org.apache.spark.unsafe.types.UTF8String.fromString(precomposedCafe)
    assert(h.compute(in) eq in) // identity, not just equality
  }

  test("decomposed and precomposed spellings collide after normalization") {
    val n = Seq(precomposedCafe, decomposedCafe).toDF("s")
      .select(NfcNormalize.nfc(col("s")).as("n"))
      .distinct().count()
    assert(n == 1)
  }

  test("jamo sequence composes to the precomposed syllable") {
    val h = new NfcNormalizeHelper
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("\u1100\u1161\u11a8")
    assert(h.compute(in).toString == "\uac01")
  }

  test("null propagates") {
    val rows = Seq(Some(decomposedCafe), None).toDF("s")
      .select(NfcNormalize.nfc(col("s")).as("n")).collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == precomposedCafe))
  }

  test("group-by keys collide across spellings (the dedup motivation)") {
    val df = Seq(precomposedCafe, decomposedCafe, precomposedCafe, "other").toDF("s")
    val g = df.groupBy(NfcNormalize.nfc(col("s")).as("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g(precomposedCafe) == 3 && g("other") == 1)
  }
}
