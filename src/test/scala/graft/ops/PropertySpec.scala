package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2.4) on small generated inputs
  * pushed through the real Spark operators. Raw ScalaCheck generators with
  * fixed seeds (the scalatest bridge isn't in the offline dep set), so runs
  * are deterministic.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default.withSize(30)
  private def samples[T](g: Gen[T], n: Int = 10): Seq[T] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    samples(g).foreach(body)

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    samples(Gen.zip(ga, gb)).foreach { case (a, b) => body(a, b) }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val labelGen = Gen.oneOf("A", "B", "C")
  private val keyGen = Gen.choose(0, 20).map(i => s"k$i")
  private val nodeGen = Gen.zip(labelGen, keyGen, Gen.alphaStr.map(s => Map("p" -> s.take(4))))
  private val nodesGen = Gen.listOf(nodeGen)

  test("upsert idempotence: g ∪ x ∪ x == g ∪ x") {
    forAll(nodesGen) { rows =>
      whenever(rows.nonEmpty) {
        val inc = GraphTable.firstWriterWins(
          GraphTable.withRowIndex(rows.toDF("label", "key", "props")),
          Seq("label", "key"), "row_idx").drop("row_idx")
        val once = GraphTable.empty(spark).upsertNodes(inc)
        val twice = once.upsertNodes(inc)
        val a = once.nodes.as[(String, String, Map[String, String])].collect().toSet
        val b = twice.nodes.as[(String, String, Map[String, String])].collect().toSet
        assert(a == b)
      }
    }
  }

  test("upsert union bound: |g ∪ x| == |distinct keys of g ∪ x|") {
    forAll2(nodesGen, nodesGen) { (r1, r2) =>
      val d1 = r1.map(t => (t._1, t._2) -> t).toMap.values.toSeq
      val d2 = r2.map(t => (t._1, t._2) -> t).toMap.values.toSeq
      whenever(d1.nonEmpty || d2.nonEmpty) {
        val g = GraphTable.empty(spark)
          .upsertNodes(d1.toDF("label", "key", "props"))
          .upsertNodes(d2.toDF("label", "key", "props"))
        val expected = (d1.map(t => (t._1, t._2)) ++ d2.map(t => (t._1, t._2))).distinct.size
        assert(g.nodes.count() == expected)
      }
    }
  }

  test("sanitize is idempotent and always lands in [a-zA-Z0-9\\s]*") {
    forAll(Gen.listOf(Gen.asciiPrintableStr)) { strs =>
      whenever(strs.nonEmpty) {
        val df = strs.toDF("v").select(Sanitize.sanitize(col("v")).as("s"))
        val once = df.as[String].collect().toSeq
        val twice = df.select(Sanitize.sanitize(col("s"))).as[String].collect().toSeq
        assert(once == twice)
        assert(once.forall(_.matches("[a-zA-Z0-9\\s]*")))
      }
    }
  }

  test("transitive closure matches brute force on random DAGs") {
    // DAG by construction: edges only point from smaller to larger id.
    // Small id range + arbitrary depth → multi-level diamonds are common,
    // which is exactly the shape that once turned the closure into a
    // multiset (duplicate frontier rows re-expanding each iteration).
    val edgeGen = Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    forAll(Gen.listOf(edgeGen)) { edges =>
      whenever(edges.nonEmpty) {
        val dedup = edges.distinct
        val df = dedup.toDF("child_id", "parent_id")
        val rows = TransitiveClosure.closure(df)
          .select("child_id", "ancestor_id")
          .as[(Long, Long)].collect().toSeq
        // set semantics, not multiset: every (child, ancestor) pair exactly once
        assert(rows.size == rows.distinct.size,
          s"closure emitted duplicate pairs: ${rows.groupBy(identity).filter(_._2.size > 1).keys}")
        val got = rows.toSet
        // brute force reachability
        var reach = dedup.toSet
        var grew = true
        while (grew) {
          val next = reach ++ (for {
            (a, b) <- reach; (c, d) <- reach if b == c
          } yield (a, d))
          grew = next.size > reach.size
          reach = next
        }
        assert(got == reach)
      }
    }
  }
}
