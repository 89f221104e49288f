package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed UDAF: the k SMALLEST DISTINCT values per group, ascending — the
  * k-min sketch shape (document fingerprinting: k minimum bigram hashes).
  *
  * Why not distinct + row_number window: that sorts the ENTIRE exploded
  * index (docs × values) inside each partition to keep k rows per group.
  * This aggregator carries a ≤k-element buffer through the hash aggregate:
  * partial-combines map-side, so each partition ships at most k values per
  * group to the shuffle and NO sort of the index ever exists — the
  * difference between sorting 100 TB of n-grams and shuffling |docs|×k
  * hashes.
  *
  * Distinctness falls out of the bound: a value outside the k smallest
  * distinct values can never enter the final set, so dedup-within-buffer is
  * exact — no global distinct pass needed.
  *
  * Runtime caveat (invisible in the plan): typed Aggregators execute via
  * ObjectHashAggregateExec, which falls back to SORT-based aggregation
  * after `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * distinct keys per partition — default 128, i.e. the per-partition sort
  * quietly returns on any realistic group count. Sessions using this (or
  * any bounded-buffer) aggregator over many groups should raise the
  * threshold (Bench/Verify set 1e6; safe exactly because the buffers are
  * ≤k rows). Even under fallback the SHUFFLE bound still holds — only the
  * map-side no-sort property is lost.
  */
class KMinDistinctAggregator(k: Int)
    extends Aggregator[String, mutable.ArrayBuffer[String], Seq[String]] {
  require(k > 0)

  /** Insert keeping the buffer sorted ascending, distinct, ≤k. Linear scan:
    * k is sketch-sized (single digits), so binary search would lose. */
  private def insert(buf: mutable.ArrayBuffer[String], v: String): mutable.ArrayBuffer[String] = {
    if (v == null) return buf
    var i = 0
    while (i < buf.size && buf(i) < v) i += 1
    if (i < buf.size && buf(i) == v) buf          // already present
    else if (i == buf.size && buf.size >= k) buf  // larger than the kth min
    else {
      buf.insert(i, v)
      if (buf.size > k) buf.remove(k)
      buf
    }
  }

  override def zero: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty

  override def reduce(buf: mutable.ArrayBuffer[String], v: String): mutable.ArrayBuffer[String] =
    insert(buf, v)

  override def merge(
      a: mutable.ArrayBuffer[String],
      b: mutable.ArrayBuffer[String]): mutable.ArrayBuffer[String] = {
    b.foreach(insert(a, _))
    a
  }

  override def finish(buf: mutable.ArrayBuffer[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[String]] =
    Encoders.kryo[mutable.ArrayBuffer[String]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
