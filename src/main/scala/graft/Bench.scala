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
  *
  * Attributability: everything written to System.err (query failures,
  * executor-pool stack traces, uncaught handler output) is ALSO teed to a
  * log file named in the JSON line (`log`), so a stray stack fragment in a
  * harness tail can be traced to its query instead of staying anonymous.
  *
  * Storage hygiene: after each query the session's persistent RDD blocks
  * (eager localCheckpoints, GraphX internal caches) are swept, keeping only
  * frames still live in [[graft.queries.SharedCache]]; after the catalog a
  * final clear+sweep runs and `leaked_rdds` reports what is STILL persisted
  * — the long-lived-session leak check, asserted at 0 by the spec suite.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val logPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOG", "/tmp/graft_bench_stderr.log")
    val logStream = new java.io.PrintStream(new java.io.FileOutputStream(logPath), true, "UTF-8")
    val realErr = System.err
    System.setErr(new java.io.PrintStream(new java.io.OutputStream {
      override def write(b: Int): Unit = { realErr.write(b); logStream.write(b) }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        realErr.write(b, off, len); logStream.write(b, off, len)
      }
      override def flush(): Unit = { realErr.flush(); logStream.flush() }
    }, true))
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
      // typed-Aggregator paths (x11/x13) run through ObjectHashAggregate,
      // which silently falls back to SORT-based aggregation after this many
      // distinct keys per partition (default 128) — exactly the per-group
      // sort the bounded-buffer aggregators exist to avoid; bounded ≤k-row
      // buffers make a large in-memory hash map safe
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
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
            e.printStackTrace() // full trace to the teed log for attribution
            None
        }
      }
      // release this query's checkpoint blocks / GraphX caches; shared
      // frames (x18's published pair set, consumed later by x25) survive
      graft.ops.CheckpointBlocks.sweep(spark, graft.queries.SharedCache.liveRddIds)
      q.name -> times.minOption
    }
    graft.queries.SharedCache.clear()
    graft.ops.CheckpointBlocks.sweep(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.size
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(t => f"$t%.3f").getOrElse("-1") }
      .mkString("{", ",", "}")
    val failed = results.count(_._2.isEmpty)
    val total = results.flatMap(_._2).sum
    // env-supplied paths go through a real JSON string escape: a quote or
    // backslash in SPARK_GRAFT_BENCH_LOG/SF_DIR must not break the one
    // line the harness json-parses (query names are code-controlled)
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"leaked_rdds":$leaked,"log":${js(logPath)},"sf":${js(sfDir)}}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
