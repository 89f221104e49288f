package graft.ops

import graft.SparkSpec

/** Hand-computed fixtures for the fixed-round lazy-chain kernels
  * (GraphAlgos.pagerankRounds / ssspRounds, BradleyTerry.rounds) — the
  * catalog gates them against DuckDB end-to-end; these pin the kernel
  * semantics in isolation on graphs small enough to verify by hand. */
class IterativeKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerankRounds: one round on a 2-node cycle is exactly 0.15 + 0.85*1.0") {
    // 1 <-> 2, both degree 1, both ranks 1.0: contribution 1.0 quantized at
    // 8 dp is exact, so r1 = 0.15 + 0.85 * 1.0 = 1.0 for both
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphAlgos.pagerankRounds(edges, rounds = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("pagerankRounds: a hub accumulates its spokes' mass (1 round, hand-computed)") {
    // star: spokes 2,3,4 each -> 1; hub 1 -> each spoke (symmetrized).
    // deg(1)=3, deg(spoke)=1. r1(hub) = 0.15 + 0.85*(3*1.0) = 2.70
    // r1(spoke) = 0.15 + 0.85*(1/3 quantized = 0.33333333) = 0.4333333305
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val r = GraphAlgos.pagerankRounds(edges, rounds = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 2.70) < 1e-12, r.toString)
    val spoke = 0.15 + 0.85 * 0.33333333
    assert(r(2L) == spoke && r(3L) == spoke && r(4L) == spoke, r.toString)
  }

  test("pagerankRounds seed mode: teleport mass reaches only seeds; non-seeds start at 0") {
    // 2-node cycle, seed = {1}: r0 = (1, 0). Round 1: node1 receives 0.0
    // (from node2's rank 0), node2 receives 1.0.
    // r1(1) = 0.2 + 0.8*0 = 0.2; r1(2) = 0 + 0.8*1 = 0.8
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphAlgos.pagerankRounds(edges, rounds = 1, resetProb = 0.2,
        seed = Some((v: Long) => v == 1L))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 0.2, 2L -> 0.8), r.toString)
  }

  test("ssspRounds: bounded rounds means min over paths of <= rounds edges") {
    // path 1 -2-> 2 -3-> 3 -4-> 4, plus a long direct edge 1 -100-> 4.
    // After 1 round: dist(4) = 100 (direct); after 3: min(100, 2+3+4=9).
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 4L), (1L, 4L, 100L))
      .toDF("src", "dst", "w")
    def dist(rounds: Int): Map[Long, Long] =
      GraphAlgos.ssspRounds(edges, source = 1L, rounds = rounds)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val d1 = dist(1)
    assert(d1(2L) == 2L && d1(4L) == 100L && !d1.contains(3L), d1.toString)
    val d3 = dist(3)
    assert(d3 == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 9L), d3.toString)
  }

  test("ssspRounds: unreached vertices are absent") {
    val edges = Seq((1L, 2L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    val d = GraphAlgos.ssspRounds(edges, source = 1L, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L), d.toString)
  }

  test("BradleyTerry.rounds: symmetric records give equal ratings; lopsided records order correctly") {
    // a vs b: 10 games, a wins 9. Both orientations present.
    val games = Seq(("a", "b", 10L, 9L), ("b", "a", 10L, 1L))
      .toDF("i", "j", "nij", "wij")
    val r = BradleyTerry.rounds(games, rounds = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") > r("b"), r.toString)
    // round 1 by hand: S_a = 10/(1+1) = 5 (exact at 8 dp), r_a = 9/5 = 1.8
    // (single-term sum, so quantization is exact); r_b = 1/5 = 0.2
    val even = Seq(("a", "b", 10L, 5L), ("b", "a", 10L, 5L))
      .toDF("i", "j", "nij", "wij")
    val re = BradleyTerry.rounds(even, rounds = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(re("a") == re("b"), re.toString)
    val r1 = BradleyTerry.rounds(games, rounds = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1("a") == 1.8 && r1("b") == 0.2, r1.toString)
  }
}
