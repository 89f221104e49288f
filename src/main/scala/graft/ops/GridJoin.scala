package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Grid-bucketed planar distance self-join — the 2-D analogue of
  * [[BucketedRangeJoin]]'s interval bucketing, for "all pairs of points
  * within distance r" workloads (spatial blocking, store/sensor
  * proximity, embedding-projection neighborhoods).
  *
  * The problem: a distance-threshold pair join has no equi-key at all —
  * the naive plan is a cartesian product with `dist ≤ r` as a residual
  * filter, O(n²) at any scale. The standard fix (public spatial-join
  * literature: grid/cell blocking, e.g. the uniform-grid partitioning
  * step of GeoSpark/Sedona and the ε-grid of DBSCAN implementations) is
  * to overlay a square grid of cell size ≥ r; every qualifying pair's
  * two cells then differ by at most one in each axis, so candidate
  * generation is an EQUI-join on the cell key with one side expanded
  * into its 3×3 cell neighborhood.
  *
  * Pair-uniqueness argument (why no dedup pass is needed), stated once
  * here for every call site: the probe side is expanded into its nine
  * neighbor cells while the build side keeps exactly its OWN cell, so
  * an unordered pair {a, b} can only meet on the composite key equal to
  * b's cell (probe = a) or a's cell (probe = b) — and each such meeting
  * happens exactly once because the nine expanded cells are distinct.
  * The caller's `id_a < id_b` residual keeps exactly one of the two
  * orientations, so each qualifying pair appears exactly once, with no
  * distinct/groupBy on the pair stream.
  *
  * Scale posture: candidate volume is Σ_cells occ(probe 3×3) · occ(build
  * cell) — bounded by local DENSITY (points per r×r cell), never by n².
  * Under a fixed-density scale-up the join is linear in n; a skewed hot
  * cell is an AQE skew-join case like any other equi-join. Both cell
  * columns are integer arithmetic (codegen'd), the 9-row expansion is
  * one `explode` (Generate), and the join is a plain shuffled equi-join
  * Catalyst may broadcast when one side is small.
  */
object GridJoin {

  /** Floor-division cell coordinate for one axis. `cell` must be ≥ the
    * join's distance threshold r (callers assert their own pair). Works
    * for negative coordinates too: `floor`, not truncation — and EXACT
    * integer arithmetic throughout: `(v - pmod(v, cell)) div cell`, never
    * a Double division (a Double round-trip loses ulps above 2^53, which
    * could land two points within r in non-adjacent cells and silently
    * drop qualifying pairs). The subtraction is exact for
    * |v| ≤ Long.MaxValue - cell, far beyond any planar coordinate. */
  def cellOf(v: Column, cell: Long): Column = {
    require(cell > 0, s"cell size must be positive: $cell")
    val lv = v.cast(LongType)
    // pmod(lv, cell) ∈ [0, cell); the difference is the exact floor
    // multiple, and `div` (IntegralDivide) stays in Long the whole way.
    call_function("div", lv - pmod(lv, lit(cell)), lit(cell)).cast(LongType)
  }

  /** Candidate pairs at planar distance² ≤ r² from a single point set.
    *
    * `points` must carry (`idCol`, `xCol`, `yCol`) with integer-valued
    * coordinates; `r` is the distance threshold and also the cell size.
    * Returns one row per unordered qualifying pair: (id_a, x_a, y_a,
    * id_b, x_b, y_b, d2) with id_a < id_b and d2 = squared Euclidean
    * distance as BIGINT — all-integer, so cross-engine exact. */
  def withinDistance(points: DataFrame, idCol: String, xCol: String,
      yCol: String, r: Long): DataFrame = {
    require(r > 0, s"distance threshold must be positive: $r")
    val pts = points.select(
      col(idCol).cast(LongType).as("id"),
      col(xCol).cast(LongType).as("x"),
      col(yCol).cast(LongType).as("y"))
    val probe = pts
      .withColumn("ddx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("ddy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("id_a"), col("x").as("x_a"), col("y").as("y_a"),
        (cellOf(col("x"), r) + col("ddx")).as("jx"),
        (cellOf(col("y"), r) + col("ddy")).as("jy"))
    val build = pts.select(col("id").as("id_b"), col("x").as("x_b"),
      col("y").as("y_b"), cellOf(col("x"), r).as("jx"),
      cellOf(col("y"), r).as("jy"))
    probe.join(build, Seq("jx", "jy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("x_a") - col("x_b")) * (col("x_a") - col("x_b")) +
          (col("y_a") - col("y_b")) * (col("y_a") - col("y_b")))
      .filter(col("d2") <= r * r)
      .drop("jx", "jy")
  }
}
