package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval × interval OVERLAP join with BOUNDED interval length — the
  * missing sibling of [[BucketedRangeJoin]] (point-in-range) and the
  * as-of join: both join sides are intervals `[s, e]` and a pair
  * qualifies when they intersect (`s1 ≤ e2 AND s2 ≤ e1`, closed ends).
  * A plain key equi-join with the overlap as a residual pays per-key
  * quadratic probe cost as history grows; the scale shape is the same
  * time-bucket trick, generalized to two exploded sides.
  *
  * Pick W ≥ the maximum interval length. Each side explodes into the
  * buckets its interval COVERS (`floor(s/W) .. floor(e/W)` — at most 2
  * buckets when length ≤ W) and the join runs on (key, bucket) with the
  * overlap predicate as residual.
  *
  * Exactly-once argument: two covered-bucket lists can intersect in up
  * to 2 buckets, so the equi-join alone would duplicate some pairs. For
  * an overlapping pair, `m = max(s1, s2)` lies inside BOTH intervals, so
  * `floor(m/W)` appears in both covered lists — the pair is kept exactly
  * where `bucket = floor(max(s1,s2)/W)` (the [[meetBucket]] residual)
  * and dropped in every other shared bucket. A non-overlapping pair
  * never survives the overlap residual regardless of shared buckets.
  * Hence the joined multiset equals the brute-force inequality join's.
  */
object OverlapJoin {

  /** Exact floor division for non-negative-or-negative longs via decimal
    * (doubles lose integer exactness past 2^53; SQL `div` truncates
    * toward zero on negatives). */
  private def fdiv(c: Column, w: Long): Column =
    floor(c.cast("decimal(38,0)") / lit(w)).cast(LongType)

  /** The exploded bucket column covering `[s, e]` at width `widthUs`.
    * With interval length ≤ widthUs this is at most 2 rows per input. */
  def coveredBuckets(s: Column, e: Column, widthUs: Long): Column = {
    require(widthUs > 0, s"bucket width must be positive: $widthUs")
    explode(sequence(fdiv(s, widthUs), fdiv(e, widthUs)))
  }

  /** The canonical bucket an overlapping pair is emitted in. */
  def meetBucket(s1: Column, s2: Column, widthUs: Long): Column =
    fdiv(greatest(s1, s2), widthUs)

  /** The closed-interval overlap predicate. */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 <= e2 && s2 <= e1
}
