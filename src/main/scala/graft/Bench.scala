package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Queries are forced through the noop sink (full
  * materialization of every output row/column — `.count()` would let Catalyst
  * prune work that a real consumer pays for).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM + parquet-footer warm-up so per-query timings measure the plan,
    // not first-touch class loading.
    SparkEntry.queries("q01_scan_project")(spark, sfDir).count()
    // min of two runs per query: the first run of a plan pays whole-stage
    // codegen JIT (~0.3-0.5 s) that a steady-state workload never sees.
    val results = SparkEntry.catalog.map { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
