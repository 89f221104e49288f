package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** AhoCorasickAutomaton vs naive per-position counting: every occurrence
  * of every pattern, overlapping and nested included. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, patterns: Seq[String]): Seq[Long] =
    patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  private def ac(text: String, patterns: Seq[String]): Seq[Long] =
    new AhoCorasickAutomaton(patterns.toArray)
      .countAll(UTF8String.fromString(text)).toSeq

  test("overlapping self-bordered pattern counts every start position") {
    val pats = Seq("aa", "aaa")
    // "aaaa": "aa" at 0,1,2 (3), "aaa" at 0,1 (2)
    assert(ac("aaaa", pats) == Seq(3L, 2L))
    assert(ac("aaaa", pats) == naive("aaaa", pats))
  }

  test("nested patterns both counted via fail-chain outputs") {
    val pats = Seq("table", "table table", "able")
    val t = "table table table"
    assert(ac(t, pats) == naive(t, pats))
    assert(ac(t, pats) == Seq(3L, 2L, 3L))
  }

  test("randomized differential vs naive over a small alphabet") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "ba", "aba", "bab", "abab", "b", "aa b")
    (1 to 50).foreach { _ =>
      val t = (1 to rnd.nextInt(60)).map(_ => "ab ".charAt(rnd.nextInt(3))).mkString
      assert(ac(t, pats) == naive(t, pats), s"text=<$t>")
    }
  }

  test("non-ASCII bytes reset cleanly and never alias into a match") {
    val pats = Seq("ab", "b")
    // é is 2 UTF-8 bytes, neither ASCII: "aéb" must not match "ab".
    assert(ac("aéb", pats) == Seq(0L, 1L))
    assert(ac("éab中", pats) == Seq(1L, 1L))
  }

  test("empty text, pattern at very end, pattern equal to text") {
    val pats = Seq("xyz", "z")
    assert(ac("", pats) == Seq(0L, 0L))
    assert(ac("wwxyz", pats) == Seq(1L, 1L))
    assert(ac("xyz", pats) == Seq(1L, 1L))
  }

  test("non-ASCII or empty patterns are rejected") {
    intercept[IllegalArgumentException](new AhoCorasickAutomaton(Array("a", "")))
    intercept[IllegalArgumentException](new AhoCorasickAutomaton(Array("café")))
    intercept[IllegalArgumentException](new AhoCorasickAutomaton(Array.empty[String]))
  }

  test("DataFrame expression path (codegen) matches the direct automaton") {
    val pats = Seq("aa", "ab c", "c")
    val texts = Seq("aabab cc", "", "ab cab c", "xyz", "aaaa")
    val got = texts.toDF("t")
      .select(AhoCorasick.matchCounts(col("t"), pats).as("c"))
      .as[Seq[Long]].collect().toSeq
    assert(got == texts.map(t => naive(t, pats)))
  }

  test("null input yields null, not a crash") {
    val got = Seq(Some("aa"), None).toDF("t")
      .select(AhoCorasick.matchCounts(col("t"), Seq("a")).as("c"))
      .collect()
    assert(got(0).getSeq[Long](0) == Seq(2L))
    assert(got(1).isNullAt(0))
  }
}
