package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MaximalRepeats vs hand-computed spans on constructed corpora: maximal
  * extents (one span per repeated block, not per window), intra-doc
  * repeats, sub-threshold misses, and the collision-verify contract. */
class MaximalRepeatsSpec extends SparkSpec {
  import spark.implicits._

  private def toksDoc(id: Long, src: String, words: Seq[String]) =
    (id, src, words.mkString(" "))

  private def run(docs: Seq[(Long, String, String)], k: Int): Set[(Long, Long, Long)] =
    MaximalRepeats.spans(docs.toDF("doc_id", "source", "text"), k)
      .select("doc_id", "start", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def uniq(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$tag$i")

  test("a shared block reports ONE maximal span per occurrence, full extent") {
    // a 10-token block shared by two docs, embedded in unique noise
    val block = uniq("shared", 10)
    val d1 = uniq("a", 5) ++ block ++ uniq("b", 5)
    val d2 = uniq("c", 3) ++ block ++ uniq("e", 7)
    val spans = run(Seq(toksDoc(1, "s", d1), toksDoc(2, "s", d2)), 4)
    // doc 1: block at 0-based 5, len 10; doc 2: at 3, len 10
    assert(spans == Set((1L, 5L, 10L), (2L, 3L, 10L)))
  }

  test("repeats shorter than k are not reported") {
    val block = uniq("blk", 3)
    val d1 = uniq("a", 4) ++ block ++ uniq("b", 4)
    val d2 = uniq("c", 4) ++ block ++ uniq("e", 4)
    assert(run(Seq(toksDoc(1, "s", d1), toksDoc(2, "s", d2)), 4).isEmpty)
  }

  test("intra-document repetition counts (suffix-array semantics)") {
    val block = uniq("rep", 6)
    val doc = block ++ uniq("mid", 4) ++ block
    val spans = run(Seq(toksDoc(7, "s", doc)), 5)
    assert(spans == Set((7L, 0L, 6L), (7L, 10L, 6L)))
  }

  test("adjacent duplicated anchors merge across overlapping sources") {
    // two different docs each share a DIFFERENT k-gram with doc 0, and the
    // two shared regions overlap inside doc 0 — the union must merge
    val left = uniq("l", 6) // tokens 0..5 of doc 0
    val right = uniq("r", 6) // tokens 4..9 of doc 0 overlap via join below
    val d0 = left ++ right // 12 tokens
    val d1 = uniq("x", 3) ++ left ++ uniq("y", 3)
    val d2 = uniq("p", 3) ++ right ++ uniq("q", 3)
    val spans = run(Seq(toksDoc(1, "s", d0), toksDoc(2, "s", d1),
      toksDoc(3, "s", d2)), 4)
    // doc 0 holds both 6-token repeats back to back: anchors 0..2 (left)
    // and 6..8 (right) do NOT touch (gap at 3..5), so two spans — while
    // docs 1/2 report their single embedded block
    assert(spans == Set((1L, 0L, 6L), (1L, 6L, 6L), (2L, 3L, 6L), (3L, 3L, 6L)))
  }

  test("anchors with gap < k merge into one span (interval union, no overlap)") {
    // doc 1 has duplicated anchors at positions 2 and 4 ONLY (position 3's
    // gram is unique): their k-windows [2,6) and [4,8) overlap, so the
    // result must be ONE maximal span [2,8) — the old gap-1 island rule
    // emitted two OVERLAPPING spans (2,len 4)+(4,len 4), double-counting
    // tokens 4..5 in any plain-sum accounting (the x201 defect)
    val core = uniq("m", 6)
    val d0 = uniq("a", 2) ++ core ++ uniq("b", 2)
    val d1 = uniq("x", 3) ++ core.take(4) ++ uniq("y", 3)
    val d2 = uniq("p", 3) ++ core.drop(2) ++ uniq("q", 3)
    val spans = run(Seq(toksDoc(1, "s", d0), toksDoc(2, "s", d1),
      toksDoc(3, "s", d2)), 4)
    assert(spans == Set((1L, 2L, 6L), (2L, 3L, 4L), (3L, 3L, 4L)))
    // the disjointness invariant x201's plain-sum accounting relies on
    val byDoc = spans.groupBy(_._1).values
    byDoc.foreach { ss =>
      val sorted = ss.toSeq.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, s1, l1), (_, s2, _)) =>
        assert(s1 + l1 <= s2, s"overlapping spans: $sorted")
      }
    }
  }

  test("incrementalSpans equals spans(union) restricted to batch docs") {
    // random index + batch with cross-dups (cloned docs), batch-internal
    // dups (pairs absent from the index), and fresh singles — the
    // incremental path must reproduce the full union recompute exactly
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 12).map(i => s"w$i")
    def doc(): String =
      Seq.fill(10 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val index = (0 until 20).map(id => (id.toLong, "s", doc()))
    val batch =
      index.take(5).map { case (id, s0, t) => (id + 100L, s0, t) } ++ // clones
        (0 until 4).flatMap { j => // internal pairs, fresh vocabulary
          val t = Seq.fill(12 + rnd.nextInt(10))(s"z${rnd.nextInt(9)}").mkString(" ")
          Seq((200L + j, "s", t), (210L + j, "s", t))
        } ++
        (0 until 4).map(j => (300L + j, "s", doc())) // fresh-ish
    val k = 3
    val idxDf = index.toDF("doc_id", "source", "text")
    val batchDf = batch.toDF("doc_id", "source", "text")
    val got = MaximalRepeats.incrementalSpans(
      batchDf, idxDf, MaximalRepeats.anchors(idxDf, k), k)
      .select("doc_id", "start", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = run(index ++ batch, k).filter(_._1 >= 100L)
    assert(got == full)
  }

  test("matches the brute-force definition on a random corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0 until 24).map { id =>
      (id.toLong, s"s${id % 3}",
        Seq.fill(10 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val k = 3
    // brute force: every k-gram occurrence, grams with >= 2 occurrences,
    // interval-union islands per doc (anchors merge while the gap < k —
    // their k-windows overlap; a gap of exactly k only touches and breaks)
    val grams = docs.flatMap { case (id, _, text) =>
      val tk = text.split(" ").filter(_.nonEmpty)
      (0 to tk.length - k).map(p => (tk.slice(p, p + k).mkString(" "), id, p))
    }
    val dup = grams.groupBy(_._1).filter(_._2.size >= 2).values.flatten
      .map(g => (g._2, g._3)).toSet
    val expect = dup.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      val runs = sorted.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), p) if p - h.head < k => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }
      runs.map(r => (id, r.min.toLong, (r.max - r.min + k).toLong))
    }.toSet
    assert(run(docs, k) == expect)
  }
}
