package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The packed-automaton Hilbert index (x187) against a direct Scala port
  * of the textbook xy2d rotate/flip loop — the same reference the tables
  * were derived from, re-checked here at several bit widths plus the
  * bijectivity property the curve must have. */
class HilbertCurveSpec extends SparkSpec {

  /** Reference: the classic xy2d loop (Wikipedia "Hilbert curve"). */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def viaSpark(bits: Int, pts: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val df = spark.createDataFrame(pts).toDF("xc", "yc")
    HilbertCurve.withIndex(df, "xc", "yc", bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("matches the xy2d reference on the full 32x32 grid (5 bits)") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = viaSpark(5, pts)
    pts.foreach { case (x, y) => assert(got((x, y)) == xy2d(5, x, y), s"($x,$y)") }
  }

  test("matches the xy2d reference on sampled 8-bit points (x187's width)") {
    val pts = (0 until 512).map { i =>
      ((i * 2654435761L >> 7) & 255L, (i * 40503L >> 3) & 255L)
    }.distinct
    val got = viaSpark(8, pts)
    pts.foreach { case (x, y) => assert(got((x, y)) == xy2d(8, x, y), s"($x,$y)") }
  }

  test("is a bijection on the 16x16 grid and stays in range") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = viaSpark(4, pts)
    assert(got.values.toSet == (0L until 256L).toSet)
  }

  test("duckCtes emits one CTE per level plus init and final rename") {
    val sql = HilbertCurve.duckCtes("src", "a", "b", 8)
    assert(sql.contains("h0 AS") && sql.contains("h8 AS") && sql.contains("AS hilbert"))
    assert(!sql.contains("h9 AS"))
  }

  test("adjacent curve positions are adjacent cells (locality)") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val byD = viaSpark(4, pts).map(_.swap)
    (0L until 255L).foreach { d =>
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1, s"jump at d=$d")
    }
  }
}
