package graft.ops

import graft.SparkSpec

class TransitiveClosureSpec extends SparkSpec {
  import spark.implicits._

  // chain: 1 -> 2 -> 3 -> 4, plus diamond 5 -> {2, 6}, 6 -> 3
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (5L, 2L), (5L, 6L), (6L, 3L))
    .toDF("child_id", "parent_id")

  test("expand(maxDepth=2) returns exactly depth-1 and depth-2 ancestor pairs") {
    val out = TransitiveClosure.expand(edges, 2)
      .as[(Long, Long, Long)].collect().toSet
    val d1 = Set((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (5L, 2L, 1L), (5L, 6L, 1L), (6L, 3L, 1L))
    val d2 = Set((1L, 3L, 2L), (2L, 4L, 2L), (5L, 3L, 2L), (5L, 3L, 2L), (6L, 4L, 2L))
    assert(out == d1 ++ d2)
  }

  test("closure reaches the transitive fixpoint with shallowest depth per pair") {
    val out = TransitiveClosure.closure(edges)
      .as[(Long, Long, Long)].collect().toSet
    // 5 reaches 3 via both 2 and 6 at depth 2 (single pair), and 4 at depth 3
    assert(out.contains((1L, 4L, 3L)) && out.contains((5L, 4L, 3L)))
    assert(out.count { case (c, a, _) => c == 5L && a == 3L } == 1)
  }

  test("closure terminates on cycles") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("child_id", "parent_id")
    val out = TransitiveClosure.closure(cyc).as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L), (2L, 1L, 1L), (1L, 1L, 2L), (2L, 2L, 2L)))
  }
}
