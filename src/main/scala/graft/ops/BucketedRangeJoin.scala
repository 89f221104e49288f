package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval-bucketed key construction for BOUNDED-range temporal joins —
  * the one asymptotic that survives 100 TB, shared by the batch range
  * joins (q22 follow-events, x92 attribution) and the stream-stream
  * joins (x152 inner, x155 left-outer).
  *
  * The problem it solves: a plain `user` equi-join with the time range
  * as a residual filter degrades to per-key quadratic work whenever the
  * key's cardinality is FIXED while history grows with scale — each
  * probe row pays O(per-key history) candidate checks (batch: measured
  * 0.8 s → 8.7 s across one 10× step before q22 was rebuilt; streaming:
  * the join-state probe scans every buffered row of the equi-key, ~2.6B
  * predicate evaluations at 100× before x152/x155 were rebuilt).
  *
  * The fix: pick a bucket width W ≥ the range span and extend the join
  * key with an event-time bucket. One side keeps its own bucket
  * `floor(t / W)`; the other side is EXPLODED into exactly its two
  * candidate buckets. Probe cost becomes bounded by the per-key rate
  * within 2W of time — independent of history length.
  *
  * Multiset-equality argument (why the pair set is unchanged), stated
  * once here for every call site: let a and b be rows whose timestamps
  * satisfy the range predicate, which (given W ≥ span) implies
  * 0 ≤ |t_b − t_a| ≤ W. Then bucket(t_b) ∈ { bucket(t_a),
  * bucket(t_a) ± 1 } with the sign fixed by the range's direction. So
  * if the a-side is exploded into { bucket(t_a), bucket(t_a) + dir },
  * the qualifying pair meets on exactly ONE composite key — the b-row's
  * own bucket, which occurs exactly once in a's candidate set (the two
  * candidates are distinct) — and a pair that fails the range predicate
  * is removed by the residual condition exactly as before. Hence the
  * joined multiset, and every downstream aggregate, is identical to the
  * un-bucketed join's. For OUTER joins, explode the INNER side only:
  * the preserved side keeps one row and therefore emits its null row
  * exactly once.
  *
  * Both columns are plain integer expressions over `unix_micros`, so
  * they are codegen'd, usable as streaming join keys (state-store key
  * extension — Spark's stream-stream join probe then scans one bucket's
  * rows instead of the key's full buffered history), and AQE/broadcast
  * decisions are unaffected.
  */
object BucketedRangeJoin {

  /** The bucket a row's event time lands in: floor(micros / widthUs).
    * `widthUs` must be ≥ the join's range span (callers assert the pair
    * in their own units — e.g. 1h range → 1h buckets). */
  def bucketOf(ts: Column, widthUs: Long): Column = {
    require(widthUs > 0, s"bucket width must be positive: $widthUs")
    floor(unix_micros(ts) / widthUs).cast(LongType)
  }

  /** The exploded TWO-candidate bucket column for the side whose range
    * partner may sit one bucket away: its own bucket and the adjacent
    * one in `dir`. Use dir = +1 when this side's range looks FORWARD in
    * time (partner t ∈ (t_a, t_a + W]: the partner's bucket is this
    * bucket or the next), dir = −1 when the partner may be EARLIER
    * (t ∈ [t_a − W, t_a): this bucket or the previous — equivalently,
    * when this side probes backward into the other side's range). */
  def candidateBuckets(ts: Column, widthUs: Long, dir: Int): Column = {
    require(dir == 1 || dir == -1, s"dir must be +1 or -1: $dir")
    val b = bucketOf(ts, widthUs)
    explode(array(b, b + dir))
  }
}
