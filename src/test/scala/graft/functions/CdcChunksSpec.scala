package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CdcChunks invariants: lossless reconstruction, boundary-rule edge cases,
  * and the content-defined property itself — chunk identity downstream of
  * an edit survives, which is the whole point of CDC over fixed-stride
  * chunking (x30). The cross-engine bit-equality of the boundary rule is
  * gated by the x63 oracle; this spec owns the semantic properties. */
class CdcChunksSpec extends SparkSpec {

  private def chunksOf(texts: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), CdcChunks.chunks(col("text")).as("ch"))
      .orderBy("id").collect()
      .map(_.getSeq[String](1).toList).toList
  }

  test("reconstruction: chunks concatenate back to the text, all nonempty") {
    val docs = Tables.documents(spark, sf001)
    val bad = docs
      .select(col("doc_id"), col("text"),
        CdcChunks.chunks(col("text")).as("ch"))
      .filter(
        concat_ws("", col("ch")) =!= col("text") ||
          exists(col("ch"), c => length(c) === 0))
    assert(bad.isEmpty)
  }

  test("edge cases: empty → no chunks; shorter than window → one chunk") {
    val out = chunksOf(Seq("", "a", "1234567", "12345678"))
    assert(out.head == Nil)
    assert(out(1) == List("a"))
    assert(out(2) == List("1234567"))
    assert(out(3).mkString == "12345678")
  }

  test("content-defined: chunks after the first original boundary survive a prefix edit") {
    val text = Tables.documents(spark, sf001)
      .orderBy("doc_id").select("text").as[String](spark.implicits.newStringEncoder)
      .filter((s: String) => s.length > 200).head()
    val Seq(orig, edited) = chunksOf(Seq(text, "INSERTED PREFIX >>" + text))
    assert(orig.size >= 2, s"fixture text produced ${orig.size} chunks")
    // every chunk after the first original cut reappears verbatim
    assert(edited.takeRight(orig.size - 1) == orig.drop(1),
      s"\nedited tail: ${edited.takeRight(orig.size - 1)}\norig tail: ${orig.drop(1)}")
    // the fixed-stride counterexample: x30-style 64-char slices share no
    // alignment after the same edit (first slice absorbs the prefix)
    val stride = text.grouped(64).toList
    val strideEdited = ("INSERTED PREFIX >>" + text).grouped(64).toList
    assert(stride.drop(1).intersect(strideEdited).isEmpty)
  }

  test("non-BMP codepoints: reconstruction holds and offsets stay codepoint-true") {
    val texts = Seq(
      "𝔘𝔴 surrogate pairs 𝔘𝔴 interleaved with ascii text long enough to cut",
      "日本語テキストが続く長い文字列でカットポイントを探すテスト")
    chunksOf(texts).zip(texts).foreach { case (ch, t) =>
      assert(ch.mkString == t)
      assert(ch.forall(_.nonEmpty))
    }
  }
}
