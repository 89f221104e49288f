package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row

/** Mathematical invariants of the round-6 iterative/batching queries —
  * properties the oracle hash-compare cannot express because they must hold
  * on ANY input, not just the fixture: PageRank's damping floor, SSSP's
  * frontier monotonicity, and the rearrangement inequality behind
  * length-sorted batching.
  */
class GraphIterativeInvariantsSpec extends SparkSpec {

  private def rows(name: String): Seq[Row] =
    SparkEntry.catalog.find(_.name == name).get.build(spark, sf001).collect().toSeq

  test("q44: every rank respects the damping floor and the source ranking is total") {
    val rs = rows("q44_pagerank")
    assert(rs.nonEmpty)
    // r = 0.15 + 0.85·(non-negative mass) ⇒ r ≥ 0.15 for every emitted node
    assert(rs.forall(_.getAs[Double]("pr") >= 0.15), rs.mkString("\n"))
    // rn is 1..n with pr non-increasing along it
    val prs = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("pr"))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b }, prs)
  }

  test("q45: distances start at the source, stay non-negative, and are monotone in rank") {
    val rs = rows("q45_shortest_path").sortBy(_.getAs[Long]("rn"))
    assert(rs.head.getAs[String]("node") == "s1" && rs.head.getAs[Long]("dist") == 0L)
    val ds = rs.map(_.getAs[Long]("dist"))
    assert(ds.forall(_ >= 0L), ds)
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, ds)
  }

  test("x56: length-sorted batching never pads more than natural order (rearrangement inequality)") {
    val rs = rows("x56_length_batching")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val saved = r.getAs[Long]("saved_tokens")
      assert(saved >= 0L, s"sorted batching padded MORE for ${r.getAs[String]("source")}: $r")
      // padding is waste over the true token mass, for both orders
      assert(r.getAs[Long]("sorted_padded") >= r.getAs[Long]("n_tokens"), r.toString)
    }
  }

  test("x57: encodings are well-formed symbol strings and merges only ever shrink") {
    val rs = rows("x57_bpe_encode")
    assert(rs.nonEmpty)
    val sym = "(<[^<>]+>)+".r
    rs.foreach { r =>
      val enc = r.getAs[String]("encoded")
      assert(sym.matches(enc), s"malformed encoding: $enc")
      val before = r.getAs[Long]("n_before")
      val after = r.getAs[Long]("n_after")
      // each applied merge reduces the symbol count by ≥1, none can grow it;
      // 5 merge rules bound the shrink per word by construction
      assert(after >= 1L && after <= before, r.toString)
      assert(after == "<".r.findAllIn(enc).length, r.toString)
    }
  }
}
