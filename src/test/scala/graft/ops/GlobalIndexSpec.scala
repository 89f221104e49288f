package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalIndex.assign vs the definitional single-partition row_number —
  * equality on skewed/tied data plus the plan contract the op exists
  * for: no unpartitioned window ever runs over the data. */
class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def truth(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap

  private def check(rows: Seq[(Long, Long)], nBuckets: Int): Unit = {
    val got = GlobalIndex.assign(rows.toDF("id", "s").repartition(7),
        col("s"), col("id"), nBuckets, "idx")
      .select("id", "idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth(rows), s"nBuckets=$nBuckets")
  }

  test("dense 0..n-1 in (s, id) order — uniform keys, several widths") {
    val rows = (0L until 500L).map(i => (i, (i * 37) % 101))
    for (nb <- Seq(1, 3, 32, 1000)) check(rows, nb)
  }

  test("heavy ties: constant sort key degenerates to tie-column order") {
    check((0L until 300L).map(i => (i, 42L)), 16)
  }

  test("skew: 90% of rows share one key; negatives and gaps in the rest") {
    val rows = (0L until 270L).map(i => (i, 7L)) ++
      Seq((1000L, -50L), (1001L, -50L), (1002L, 999999L), (1003L, 0L))
    check(rows, 8)
  }

  test("matches row_number() on a DataFrame twin") {
    val df = (0L until 400L).map(i => (i, i % 13)).toDF("id", "s")
    val want = df.withColumn("idx",
        row_number().over(Window.orderBy("s", "id")).cast("long") - 1L)
      .select("id", "idx").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = GlobalIndex.assign(df, col("s"), col("id"), 32, "idx")
      .select("id", "idx").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == want)
  }

  test("plan: the only unpartitioned window runs over the bucket table, " +
      "never the data") {
    val df = (0L until 100L).map(i => (i, i % 5)).toDF("id", "s")
    val p = GlobalIndex.assign(df, col("s"), col("id"), 16, "idx")
      .queryExecution.executedPlan.toString
    // the data-side window is partitioned by gk_b; the offsets window
    // (unpartitioned, over <= nBuckets aggregated rows) sits downstream
    // of a HashAggregate, and the offsets subtree is broadcast
    val rn = "row_number\\(\\) windowspecdefinition\\(([a-z_#0-9L]*)"
      .r.findAllMatchIn(p).map(_.group(1)).toList
    assert(rn.nonEmpty, p.take(4000))
    // every row_number window is partitioned by the bucket column
    assert(rn.forall(_.startsWith("gk_b")), s"$rn\n${p.take(4000)}")
  }
}
