package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: the exact integer Gram matrix Σ q qᵀ of quantized
  * vectors, accumulated as ONE upper-triangle long buffer per
  * partition — the x180 corpus pass.
  *
  * Why not a d×d generator + hash agg: the generator materializes
  * n·d² rows through GenerateExec just to feed a d²-group aggregate —
  * at 10× that is 200M generated rows for a 64×64 result (35–46 s
  * measured). This aggregator does the same multiply-adds inside one
  * buffer per partition: n·d(d+1)/2 long fused ops, no row machinery,
  * and the shuffle carries ONE 2 080-long buffer per partition instead
  * of d²·partitions rows. The d is inferred from the first vector
  * (zero is empty; merge unifies), so the aggregator is dimension-
  * agnostic. finish() expands the triangle to the full d² row-major
  * plane so the consumer can posexplode with i = pos div d,
  * j = pos mod d.
  *
  * Exactness: inputs are already-quantized longs (|q| ≤ 8 in x180), so
  * every accumulation is exact integer arithmetic — the oracle's
  * self-join Gram matches bit for bit. */
class GramAggregator extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private def dim(len: Int): Int = {
    // len = d(d+1)/2 → d; exact integer inversion
    val d = ((math.sqrt(8.0 * len + 1) - 1) / 2).round.toInt
    require(d * (d + 1) / 2 == len, s"not a triangle length: $len")
    d
  }

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
    if (q == null) return buf
    val v = q.toArray
    val d = v.length
    val b = if (buf.length == 0) new Array[Long](d * (d + 1) / 2) else buf
    require(b.length == d * (d + 1) / 2, "mixed vector dimensions")
    var idx = 0
    var i = 0
    while (i < d) {
      val vi = v(i)
      var j = i
      while (j < d) { b(idx) += vi * v(j); j += 1; idx += 1 }
      i += 1
    }
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

  /** Expand upper triangle to the full d² row-major plane. */
  override def finish(tri: Array[Long]): Seq[Long] = {
    if (tri.length == 0) return Seq.empty
    val d = dim(tri.length)
    val full = new Array[Long](d * d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        full(i * d + j) = tri(idx)
        full(j * d + i) = tri(idx)
        j += 1; idx += 1
      }
      i += 1
    }
    full.toSeq
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
