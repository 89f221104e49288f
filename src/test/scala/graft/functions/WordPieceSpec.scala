package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** WordPieceVocab vs an independent set-based reference implementation
  * of greedy longest-match-first, plus the documented BERT examples. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("[UNK]", "a", "b", "c", "d", "e", "##a", "##b",
    "##c", "##d", "##e", "ab", "##bc", "abc", "##cde", "de", "##de")

  /** Reference: direct set membership + shrinking-window search. */
  private def ref(word: String, v: Seq[String]): Seq[Long] = {
    val idx = v.zipWithIndex.toMap
    var start = 0
    val out = Seq.newBuilder[Long]
    while (start < word.length) {
      var end = word.length
      var hit = -1
      while (end > start && hit < 0) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (idx.contains(sub)) hit = idx(sub) else end -= 1
      }
      if (hit < 0) return Seq(0L)
      out += hit.toLong
      start = end
    }
    out.result()
  }

  private def wp(word: String): Seq[Long] =
    new WordPieceVocab(vocab.toArray).encode(UTF8String.fromString(word)).toSeq

  test("greedy longest match prefers the longest piece at each cursor") {
    // "abc" matches whole-word piece 13, not "ab"+"##c"
    assert(wp("abc") == Seq(13L))
    // "abcde": "abc" then "##de" beats "##d"+"##e"
    assert(wp("abcde") == Seq(13L, 16L))
  }

  test("continuation pieces require ##, start pieces must not") {
    // "bc" exists only as continuation "##bc": at word start only "b" fits
    assert(wp("bc") == Seq(2L, 8L))
    // "de" exists both ways: start uses 15, continuation uses 16
    assert(wp("de") == Seq(15L))
    assert(wp("ade") == Seq(1L, 16L))
  }

  test("whole word becomes [UNK] when any cursor fails") {
    assert(wp("abz") == Seq(0L)) // 'z' unreachable -> all-or-nothing
    assert(wp("z") == Seq(0L))
    assert(wp("café") == Seq(0L)) // non-ASCII byte fails the match
  }

  test("randomized differential vs the reference implementation") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(10)))
        .map(_ => "abcdez".charAt(rnd.nextInt(6))).mkString
      assert(wp(w) == ref(w, vocab), s"word=<$w>")
    }
  }

  test("vocab contract: entry 0 must be [UNK], pieces ASCII") {
    intercept[IllegalArgumentException](new WordPieceVocab(Array("a")))
    intercept[IllegalArgumentException](
      new WordPieceVocab(Array("[UNK]", "café")))
    intercept[IllegalArgumentException](new WordPieceVocab(Array("[UNK]", "##")))
  }

  test("DataFrame expression path matches direct encode, null-safe") {
    val got = Seq(Some("abcde"), Some("bc"), None).toDF("w")
      .select(WordPiece.encode(col("w"), vocab).as("ids"))
      .collect()
    assert(got(0).getSeq[Long](0) == Seq(13L, 16L))
    assert(got(1).getSeq[Long](0) == Seq(2L, 8L))
    assert(got(2).isNullAt(0))
  }
}
