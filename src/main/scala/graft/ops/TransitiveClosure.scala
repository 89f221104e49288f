package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ancestor expansion over a parent-edge table — the Spark-first analog of the
  * reference's PARENT_OF hierarchy (`/root/reference/main.py:81-93`, which only
  * materializes 1-hop edges; ancestors/descendants are implied by the DAG).
  *
  * Iterative hash-join expansion: frontier(k+1) = frontier(k) ⋈ edges. Each
  * iteration is one shuffle on the join key; for bounded-depth ontologies
  * (tree height ~10-20) this beats Pregel messaging overhead and keeps the
  * whole plan in Tungsten codegen. At 100 TB the edge table should be
  * pre-partitioned (bucketed) on `child_id` so every iteration co-locates.
  */
object TransitiveClosure {

  /** @param edges DataFrame[child_id: Long, parent_id: Long]
    * @return DataFrame[child_id, ancestor_id, depth] for depth in 1..maxDepth
    */
  def expand(edges: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val base = edges
      .select(col("child_id"), col("parent_id").as("ancestor_id"), lit(1L).as("depth"))
    var frontier = base
    var acc = base
    for (d <- 2 to maxDepth) {
      frontier = frontier
        .join(
          edges.select(col("child_id").as("j_child"), col("parent_id").as("j_parent")),
          col("ancestor_id") === col("j_child"))
        .select(col("child_id"), col("j_parent").as("ancestor_id"), lit(d.toLong).as("depth"))
      acc = acc.unionByName(frontier)
    }
    acc
  }

  /** Full closure with cycle-safe termination: iterate until the frontier is
    * empty or `hardCap` depth is reached. Each iteration checkpoints via
    * localCheckpoint to truncate lineage (iterative joins otherwise build an
    * exponentially deep plan).
    */
  def closure(edges: DataFrame, hardCap: Int = 64): DataFrame = {
    val base = edges
      .select(col("child_id"), col("parent_id").as("ancestor_id"), lit(1L).as("depth"))
    var acc = base.localCheckpoint(eager = true)
    var frontier = acc
    var d = 1
    while (d < hardCap && !frontier.isEmpty) {
      d += 1
      frontier = frontier
        .join(
          edges.select(col("child_id").as("j_child"), col("parent_id").as("j_parent")),
          col("ancestor_id") === col("j_child"))
        .select(col("child_id"), col("j_parent").as("ancestor_id"), lit(d.toLong).as("depth"))
        // within-frontier dedup: a diamond (two paths child→…→anc of equal
        // length) lands the same (child, anc) pair twice in one frontier;
        // without this, each copy re-expands next iteration and the
        // "closure" becomes a combinatorially growing multiset on dense DAGs
        .dropDuplicates("child_id", "ancestor_id")
        // drop pairs already seen at a shallower depth (cycle guard)
        .join(acc.select(col("child_id").as("s_c"), col("ancestor_id").as("s_a")),
          col("child_id") === col("s_c") && col("ancestor_id") === col("s_a"), "left_anti")
        .localCheckpoint(eager = true)
      if (!frontier.isEmpty) acc = acc.unionByName(frontier).localCheckpoint(eager = true)
    }
    acc
  }
}
