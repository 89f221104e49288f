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

  /** Replays `input` with EXPLICIT micro-batch assignment: `batchCol` (an
    * integral column with values 0..nBatches-1) decides which micro-batch
    * carries each row, and batches are guaranteed to be processed IN batch
    * order. Each batch is written as exactly one parquet file whose
    * modification time is pinned 2 s apart, so the file source's
    * oldest-first ordering replays them deterministically — the property a
    * WATERMARK gate needs, since the watermark's advance (and therefore
    * which late rows are admitted or dropped) is a function of which rows
    * each batch carried.
    *
    * `batchCol` is dropped before the stream sees the rows. */
  def replayStaged(
      spark: SparkSession,
      input: DataFrame,
      name: String,
      batchCol: String,
      nBatches: Int,
      mode: String = "append",
      progress: org.apache.spark.sql.streaming.StreamingQueryProgress => Unit = _ => ())(
      transform: DataFrame => DataFrame): DataFrame = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe stream-gate name: $name")
    val seq = runSeq.incrementAndGet()
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_${name}_" +
      s"${ProcessHandle.current().pid()}_$seq"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = System.currentTimeMillis() - (nBatches + 1) * 2000L
    try {
      for (i <- 0 until nBatches) {
        val stage = s"$dir/_stage_$i"
        input.filter(org.apache.spark.sql.functions.col(batchCol) === i)
          .drop(batchCol).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
          .map(_.getPath).find(_.getName.startsWith("part-"))
          .getOrElse(sys.error(s"stream gate $name: no part file for batch $i"))
        val dst = new org.apache.hadoop.fs.Path(f"$dir/batch-$i%04d.parquet")
        if (!fs.rename(part, dst)) sys.error(s"stream gate $name: rename failed")
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        fs.setTimes(dst, base + i * 2000L, -1)
      }
      val schema = input.drop(batchCol).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(s"$dir/batch-*.parquet")
      val sink = s"graft_stream_sink_${name}_$seq"
      val q = transform(stream).writeStream
        .format("memory").queryName(sink).outputMode(mode)
        .trigger(Trigger.AvailableNow()).start()
      try {
        q.awaitTermination()
        q.recentProgress.foreach(progress)
      } finally if (q.isActive) q.stop()
      val out = spark.table(sink).localCheckpoint(eager = true)
      spark.catalog.dropTempView(sink)
      out
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      try fs.delete(p, true) catch { case _: Exception => () }
    }
  }

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
