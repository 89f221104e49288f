package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global dense row numbering (0..n-1 in a total order) without a global
  * single-partition sort.
  *
  * The obvious formulation — `row_number() OVER (ORDER BY k)` with no
  * PARTITION BY — moves the ENTIRE dataset through one WindowExec
  * partition (Spark itself warns "Moving all data to a single partition");
  * at 100 TB that is the canonical scale-killer: one task sorts everything.
  * The scale shape is the classic two-pass offset assignment (the contract
  * of RDD `zipWithIndex`, re-expressed declaratively so both passes stay
  * whole-stage-codegen'd DataFrame ops):
  *
  *  1. bucket every row by a MONOTONE integer function of the sort key —
  *     fixed-width value ranges derived from a 1-row (min, max) aggregate.
  *     Contiguous key ranges map to contiguous buckets, so bucket order IS
  *     a prefix of the global order. Deterministic by construction: unlike
  *     `repartitionByRange` (whose RangePartitioner SAMPLES to pick
  *     boundaries), re-evaluating the frame can never re-assign a row, so
  *     the two passes agree without caching the data;
  *  2. per-bucket counts (one partial-agg pass; the shuffle carries
  *     ≤ nBuckets rows) → exclusive prefix offsets via a window over the
  *     BOUNDED bucket table (nBuckets rows, not data) — broadcast back;
  *  3. local rank via a PARTITIONED window (partitionBy bucket — a real
  *     hash-distributed sort across executors); the global index is
  *     bucket offset + local rank − 1.
  *
  * Two passes over the data, and the only data-sized shuffle is the
  * hash-by-bucket exchange feeding the partitioned sort. A skewed sort key
  * concentrates rows in few buckets — the same failure mode as any range
  * partitioning; raise nBuckets (the bucket table stays tiny) or compose
  * with a pre-pass that spreads constant keys by the tie column.
  */
object GlobalIndex {

  /** Appends `outCol` = dense global position (0-based) of each row in the
    * total order (sortKey ASC, tie ASC). `sortKey` must cast to long;
    * `tie` must be a unique long (ties in sortKey are broken by it, which
    * also makes the result deterministic).
    */
  def assign(df: DataFrame, sortKey: Column, tie: Column, nBuckets: Int,
      outCol: String): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val base = df
      .withColumn("gk_s", sortKey.cast(LongType))
      .withColumn("gk_t", tie.cast(LongType))
    // 1-row frame; the crossJoin below is a broadcast of two longs.
    val mm = base.agg(min("gk_s").as("gk_lo"), max("gk_s").as("gk_hi"))
    val bucketed = base.crossJoin(broadcast(mm)).withColumn("gk_b",
      least(lit(nBuckets - 1L), floor(
        (col("gk_s") - col("gk_lo")).cast("decimal(38,0)") * nBuckets /
          (col("gk_hi") - col("gk_lo") + 1L)).cast(LongType)))
    // Pass 1: bucket counts → exclusive prefix offsets. The unpartitioned
    // window here runs over ≤ nBuckets rows (the aggregated bucket table),
    // never the data — bounded by construction.
    val offsets = bucketed.groupBy("gk_b")
      .agg(count(lit(1)).as("gk_n"))
      .withColumn("gk_off", coalesce(sum("gk_n").over(
        Window.orderBy("gk_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("gk_b", "gk_off")
    // Pass 2: partitioned rank + broadcast offset join.
    val ranked = bucketed.withColumn("gk_r", row_number().over(
      Window.partitionBy("gk_b").orderBy("gk_s", "gk_t")).cast(LongType))
    ranked.join(broadcast(offsets), "gk_b")
      .withColumn(outCol, col("gk_off") + col("gk_r") - 1L)
      .drop("gk_b", "gk_s", "gk_t", "gk_lo", "gk_hi", "gk_r", "gk_off")
  }
}
