package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** [[TopKAggregator]]'s sibling for STRING payloads: exact top-k of
  * (score, payload) per group in one pass with a bounded k-sized buffer —
  * keyword extraction, label ranking, any "best k strings per entity"
  * shape. Same scale argument: a ranking window sorts every candidate row
  * of every group; this partial-combines map-side so each partition ships
  * at most k rows per group to the shuffle. Ties break by payload
  * ascending, so results are deterministic and engine-comparable.
  */
class TopKStringsAggregator(k: Int)
    extends Aggregator[(Double, String), mutable.ArrayBuffer[(Double, String)], Seq[(Double, String)]] {
  require(k > 0)

  private def shrink(
      buf: mutable.ArrayBuffer[(Double, String)]): mutable.ArrayBuffer[(Double, String)] = {
    if (buf.size > k) {
      val sorted = buf.sortBy { case (s, p) => (-s, p) }
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def zero: mutable.ArrayBuffer[(Double, String)] = mutable.ArrayBuffer.empty

  override def reduce(
      buf: mutable.ArrayBuffer[(Double, String)],
      row: (Double, String)): mutable.ArrayBuffer[(Double, String)] = {
    buf += row
    if (buf.size > 4 * k) shrink(buf) else buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Double, String)],
      b: mutable.ArrayBuffer[(Double, String)]): mutable.ArrayBuffer[(Double, String)] =
    shrink(a ++= b)

  override def finish(buf: mutable.ArrayBuffer[(Double, String)]): Seq[(Double, String)] =
    buf.sortBy { case (s, p) => (-s, p) }.take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, String)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, String)]]

  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()
}
