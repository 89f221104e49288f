package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Queries are forced through the noop sink (full
  * materialization of every output row/column — `.count()` would let Catalyst
  * prune work that a real consumer pays for).
  *
  * A failed query is recorded as -1 and EXCLUDED from the total, with a
  * nonzero `failed` count in the JSON — a broken query must never make the
  * benchmark look faster (its near-zero elapsed time used to feed the min).
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
      // local mode: every task is process-local; never wait for locality
      .config("spark.locality.wait", "0ms")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table once so parquet footer reads, FileIndex
    // listing, and first-touch JVM class loading happen outside the timed
    // region (a steady-state workload has all of these cached).
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $t: ${e.getMessage}") }
    }
    // min of two runs per query: the first run of a plan pays whole-stage
    // codegen JIT (~0.3-0.5 s) that a steady-state workload never sees.
    val results = SparkEntry.catalog.map { q =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name}: ${e.getMessage}")
            None
        }
      }
      q.name -> times.minOption
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(t => f"$t%.3f").getOrElse("-1") }
      .mkString("{", ",", "}")
    val failed = results.count(_._2.isEmpty)
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
