package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Replays a batch frame through Structured Streaming in REAL micro-batches
  * and hands back the final result as a plain DataFrame — the bridge that
  * lets streaming execution be oracle-gated like every other catalog query.
  *
  * The input is written out as N parquet files and consumed by a file
  * source with `maxFilesPerTrigger = 1`, so the query genuinely runs N
  * stateful micro-batches (state carried, merged, and re-emitted across
  * batches — not one degenerate batch), under `Trigger.AvailableNow` so it
  * terminates when the backlog drains. The memory sink's final table is
  * localCheckpointed and the temp view dropped, so callers get an ordinary
  * frame with no streaming residue.
  *
  * This is exactly the claim a streaming engine must defend: INCREMENTAL
  * execution converges to the batch answer. The catalog gates (x143/x144)
  * run the same aggregation through this harness and through DuckDB's
  * batch SQL and hash-compare the results.
  */
object StreamGate {

  private val runSeq = new AtomicLong(0)

  /** @param mode  output mode — "complete" for aggregations (all groups
    *              re-emitted on the final batch), "append" for row streams.
    * @param files number of micro-batches to replay (input repartitioned
    *              into this many files). */
  def replay(
      spark: SparkSession,
      input: DataFrame,
      name: String,
      files: Int = 8,
      mode: String = "complete")(transform: DataFrame => DataFrame): DataFrame = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe stream-gate name: $name")
    // Per-run directory (pid + seq): two concurrent JVMs or parallel bench
    // runs replaying the same gate must not overwrite each other's staged
    // input between write and streaming read. Deleted after the replay.
    val seq = runSeq.incrementAndGet()
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_${name}_" +
      s"${ProcessHandle.current().pid()}_$seq"
    input.repartition(files).write.mode("overwrite").parquet(dir)
    try {
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val sink = s"graft_stream_sink_${name}_$seq"
      val q = transform(stream).writeStream
        .format("memory").queryName(sink).outputMode(mode)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
      val out = spark.table(sink).localCheckpoint(eager = true)
      spark.catalog.dropTempView(sink)
      out
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      catch { case _: Exception => () }
    }
  }
}
