package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: first and second moments of a float-vector column in ONE
  * corpus pass — Σ round8(xᵢ·xⱼ) for the upper triangle, Σ round8(xᵢ)
  * per dimension, and the row count, accumulated as one long buffer per
  * partition. The x58 covariance pass.
  *
  * Why not the posexplode × slice generator + hash agg (x58's original
  * shape): the generator materializes n·d(d+1)/2 rows through
  * GenerateExec just to feed a d²-group aggregate — 41.6M rows at sf0.1
  * (11.7 s), 4.2B rows at 100× (the one catalog row whose cost was row
  * MACHINERY, not arithmetic). Same lesson as [[GramAggregator]] (x180):
  * do the multiply-adds inside one buffer per partition; the shuffle
  * carries ONE 2 145-long buffer per partition instead of n·d² rows.
  *
  * Exactness contract (the x58 oracle is unchanged): the oracle sums
  * `CAST(xi*xj AS DECIMAL(18,8))` — per-product HALF-AWAY-FROM-ZERO
  * rounding at 8 dp, then exact decimal addition. This aggregator
  * accumulates the same quantity as UNSCALED longs: per product,
  * `y = x·1e8` in double then half-away-from-zero to a long — the same
  * binary-value rounding DuckDB's double→decimal cast performs. Long
  * addition of unscaled values IS exact decimal addition; overflow
  * headroom is ~9.2e18 against ≤ ~1e10 per product, so ~9×10⁸ rows per
  * partition at |x·y| ≤ 100 — two decades past the 100× fixture.
  * finish() converts each unscaled sum to the nearest double of the
  * exact decimal value via BigDecimal.movePointLeft (2 145 conversions
  * once per query, not per row), which is bit-identical to the
  * DECIMAL→DOUBLE cast the original plan performed.
  *
  * Buffer layout: [0, T) upper-triangle products row-major (T =
  * d(d+1)/2), [T, T+d) first moments, [T+d] row count. d is inferred
  * from the first vector; merge unifies.
  */
class CovMomentsAggregator extends Aggregator[Seq[Float], Array[Long], Seq[Double]] {

  private def round8(x: Double): Long = {
    val y = x * 1e8
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], vec: Seq[Float]): Array[Long] = {
    if (vec == null) return buf
    val v = new Array[Double](vec.length)
    var k = 0
    while (k < v.length) { v(k) = vec(k).toDouble; k += 1 }
    val d = v.length
    val tri = d * (d + 1) / 2
    val b = if (buf.length == 0) new Array[Long](tri + d + 1) else buf
    require(b.length == tri + d + 1, "mixed vector dimensions")
    var idx = 0
    var i = 0
    while (i < d) {
      val vi = v(i)
      var j = i
      while (j < d) { b(idx) += round8(vi * v(j)); j += 1; idx += 1 }
      b(tri + i) += round8(vi)
      i += 1
    }
    b(tri + d) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    require(a.length == b.length, "mixed vector dimensions")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Double] = {
    if (b.length == 0) return Seq.empty
    val out = new Array[Double](b.length)
    var i = 0
    while (i < b.length - 1) {
      out(i) = new java.math.BigDecimal(b(i)).movePointLeft(8).doubleValue()
      i += 1
    }
    out(b.length - 1) = b(b.length - 1).toDouble // the count rides unscaled
    out.toSeq
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
