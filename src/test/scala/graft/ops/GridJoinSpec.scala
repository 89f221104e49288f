package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GridJoin.withinDistance vs a brute-force O(n²) cross join: the pair
  * SET (ids + d2) must be identical, each unordered pair exactly once. */
class GridJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic scatter incl. negative coordinates and exact-threshold
    * pairs: ids 1..n, x/y from mixed congruential arithmetic shifted so
    * ~half the plane is negative (cells must floor, not truncate). */
  private def points(n: Int) =
    (1 to n).map { i =>
      (i.toLong, ((i * 7919L) % 2000L) - 1000L, ((i * 104729L) % 2000L) - 1000L)
    }.toDF("id", "x", "y")

  private def brute(n: Int, r: Long): Set[(Long, Long, Long)] = {
    val pts = (1 to n).map { i =>
      (i.toLong, ((i * 7919L) % 2000L) - 1000L, ((i * 104729L) % 2000L) - 1000L)
    }
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet
  }

  test("pair set equals brute force, each pair exactly once") {
    val r = 150L
    val got = GridJoin.withinDistance(points(400), "id", "x", "y", r)
      .select("id_a", "id_b", "d2").as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    assert(got.toSet == brute(400, r))
    assert(got.nonEmpty)
  }

  test("exact-threshold distance is included, one past it is not") {
    val pts = Seq((1L, 0L, 0L), (2L, 30L, 40L), (3L, 30L, 41L))
      .toDF("id", "x", "y")
    // |p1-p2| = 50 exactly (3-4-5 triangle); |p1-p3|² = 2581 > 2500.
    val got = GridJoin.withinDistance(pts, "id", "x", "y", 50L)
      .select("id_a", "id_b", "d2").as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 2500L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("coincident points pair once with d2 = 0") {
    val pts = Seq((7L, -123L, 456L), (9L, -123L, 456L)).toDF("id", "x", "y")
    val got = GridJoin.withinDistance(pts, "id", "x", "y", 10L)
      .select("id_a", "id_b", "d2").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 9L, 0L)))
  }

  test("cell boundary straddle: neighbors in adjacent cells still pair") {
    // x = -1 and x = 1 sit in cells -1 and 0 (floor semantics).
    val pts = Seq((1L, -1L, 0L), (2L, 1L, 0L)).toDF("id", "x", "y")
    val got = GridJoin.withinDistance(pts, "id", "x", "y", 5L)
      .select("id_a", "id_b", "d2").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L)))
  }

  test("no self pairs and empty result when nothing is near") {
    val pts = Seq((1L, 0L, 0L), (2L, 10000L, 10000L)).toDF("id", "x", "y")
    assert(GridJoin.withinDistance(pts, "id", "x", "y", 100L).count() == 0L)
  }
}
