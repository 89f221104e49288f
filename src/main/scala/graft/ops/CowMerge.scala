package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Copy-on-write MERGE planning — the lakehouse upsert underneath
  * Delta-style `MERGE INTO`: given a keyed change-set and a table laid out
  * as immutable files with per-file key statistics (the add-action stats a
  * transaction log carries, x184's metadata), decide WHICH files must be
  * rewritten. Everything else is carried forward by reference — never
  * read, never written — which is the property that makes an upsert of
  * 0.1% of keys affordable on a 100 TB table.
  *
  * The planning join is metadata × data-sized: file stats are bounded
  * (~1e5 rows for 100 TB at 1 GB files) but the change-set is NOT, so the
  * naive `changes JOIN broadcast(stats) ON k BETWEEN kmin AND kmax`
  * (a BroadcastNestedLoopJoin: |changes| × |files| predicate evaluations)
  * is the wrong shape. This is the same bounded-range problem q22/x152
  * solve with interval bucketing, applied to key space instead of time:
  * bucket width W = the widest file span (one tiny aggregate over stats),
  * each FILE explodes into the ≤ 2W-aligned buckets its [kmin, kmax]
  * overlaps, each change key computes its single bucket, and the
  * containment predicate becomes a residual on a hash equi-join. Probe
  * cost per change row is the handful of files overlapping its bucket —
  * independent of file count.
  */
object CowMerge {

  /** Files a change-set forces a rewrite of. `stats` must carry
    * (path, kmin, kmax, ...); `changes` must carry long column `keyCol`.
    * Returns the touched subset of `stats` plus `n_changes` (how many
    * change rows land in the file's range — with range stats a planning
    * fact, not necessarily exact-key matches). Completeness is the
    * soundness contract (a file containing any changed key IS returned);
    * CowMergeSpec proves it both directions against data reads.
    */
  def touchedFiles(stats: DataFrame, changes: DataFrame,
      keyCol: String): DataFrame = {
    val st = stats
      .withColumn("cm_min", col("kmin").cast(LongType))
      .withColumn("cm_max", col("kmax").cast(LongType))
    // Widest span, one metadata-sized aggregate. floorDiv keeps negative
    // keys in the right bucket.
    val wRow = st.agg(max(col("cm_max") - col("cm_min") + 1L)).first()
    if (wRow.isNullAt(0)) return stats.limit(0).withColumn("n_changes", lit(0L))
    val w = math.max(1L, wRow.getLong(0))
    // Exact floor division via decimal (doubles lose integer exactness
    // past 2^53; SQL `div` truncates toward zero on negatives).
    def fdiv(c: org.apache.spark.sql.Column) =
      floor(c.cast("decimal(38,0)") / lit(w)).cast(LongType)
    val fb = st
      .withColumn("cm_b0", fdiv(col("cm_min")))
      .withColumn("cm_b1", fdiv(col("cm_max")))
      .withColumn("cm_b", explode(expr("sequence(cm_b0, cm_b1)")))
    val ch = changes
      .select(col(keyCol).cast(LongType).as("cm_k"))
      .withColumn("cm_b", fdiv(col("cm_k")))
    ch.join(broadcast(fb), Seq("cm_b"))
      .filter(col("cm_k").between(col("cm_min"), col("cm_max")))
      .groupBy(st.columns.filter(c => !c.startsWith("cm_"))
        .map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_changes"))
  }
}
