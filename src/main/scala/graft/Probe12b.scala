package graft

import org.apache.spark.sql.SparkSession

/** Scratch sub-stage timer for round-12 pass 2 (deleted before close):
  * splits a catalog query's wall time into builder (eager checkpoints /
  * collects) vs final noop job, run twice for a warm sample. */
object Probe12b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    for (name <- names; run <- 1 to 2) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[probe12b] $name run$run build=${(t1 - t0) / 1e9}%.2f " +
        f"final=${(t2 - t1) / 1e9}%.2f total=${(t2 - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
