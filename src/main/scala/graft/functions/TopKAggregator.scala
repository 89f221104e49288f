package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed UDAF (SURVEY.md §2.3 escape-hatch order: Aggregator after built-ins
  * and custom Expression): exact top-k of (score, payload) per group in one
  * pass with a bounded k-sized buffer.
  *
  * Why not a ranking window: `row_number().over(partitionBy(g).orderBy(s))`
  * sorts EVERY row of every group (shuffle + full sort) to keep k. This
  * aggregator partial-combines map-side — each partition sends at most k
  * rows per group to the shuffle — which is the difference between sorting
  * 100 TB and shuffling |groups|×k rows. Results are deterministic: ties
  * break by payload ascending.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private def shrink(buf: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    if (buf.size > k) {
      val sorted = buf.sortBy { case (s, p) => (-s, p) }
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def zero: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

  override def reduce(
      buf: mutable.ArrayBuffer[(Double, Long)],
      row: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
    buf += row
    if (buf.size > 4 * k) shrink(buf) else buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Double, Long)],
      b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
    shrink(a ++= b)

  override def finish(buf: mutable.ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (s, p) => (-s, p) }.take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
