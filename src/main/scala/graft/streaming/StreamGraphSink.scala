package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MERGE-into-graph: edges arriving on a stream are upserted into
  * a parquet-backed edge table with the same (src, dst, rel) dedup semantics
  * as the batch `GraphTable.addEdges(dedup = true)` — i.e. the Cypher
  * edge-MERGE (/root/reference/main.py:299) as a continuous process.
  *
  * `foreachBatch` gives exactly-once-per-batch custom sink logic with the
  * stream's checkpoint tracking progress (the principled version of the
  * reference's offset-resume loads). Within a batch: drop in-batch
  * duplicates, anti-join against the current table, append only novel
  * edges — append-only writes, so a crash between append and checkpoint
  * re-appends nothing on replay (the anti-join re-filters).
  *
  * Scale design: the table is hive-partitioned by `bkt` = hash(edge key) mod
  * `nBuckets`, and each micro-batch anti-joins only the partitions its own
  * bucket set touches (`bkt.isin(...)` → PartitionFilters prune the rest at
  * the scan). A small incremental batch therefore reads O(batch buckets)
  * partitions, not the whole edge table — the previous form rescanned the
  * entire table every micro-batch. All filesystem probes go through Hadoop
  * `FileSystem`, so the table can live on HDFS/S3A, not just local disk.
  */
object StreamGraphSink {

  private val edgeCols = Seq("src_label", "src", "dst_label", "dst", "rel")

  def start(
      edges: DataFrame,
      tableDir: String,
      checkpointDir: String,
      nBuckets: Int = 64): StreamingQuery =
    edges.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, tableDir, nBuckets)
      }
      .start()

  private[streaming] def mergeBatch(
      spark: SparkSession,
      batch: DataFrame,
      tableDir: String,
      nBuckets: Int = 64): Unit = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The bucket count is part of the table LAYOUT: once written, the
    // stored count wins over the parameter — re-running with a different
    // nBuckets would hash existing edges to other buckets and silently
    // re-append them. The marker is written BEFORE the first data append
    // (it declares layout, it does not signal data): if the process dies
    // between marker and append, the replayed batch finds no bkt= dirs and
    // appends everything as novel; if it dies between append and the
    // stream checkpoint, the replay's anti-join re-filters. Data presence
    // is detected from the bkt= partition dirs themselves, so a zero-row
    // first batch cannot wedge later reads.
    val marker = new Path(dir, "_graft_buckets")
    val hasData = fs.exists(dir) &&
      fs.listStatus(dir).exists(_.getPath.getName.startsWith("bkt="))
    val storedBuckets: Option[Int] =
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        raw.trim.toIntOption.filter(_ > 0) match {
          case some @ Some(_) => some
          case None if hasData =>
            // data exists but its layout declaration is gone: the original
            // bucket count is NOT recoverable from the bkt= dirs (they only
            // show touched buckets), and guessing re-appends existing edges
            throw new IllegalStateException(
              s"$marker is unreadable but $tableDir holds data; restore the bucket " +
                "count before further merges (marker writes are temp+rename atomic, " +
                "so this indicates external corruption)")
          case None => None // corrupt marker, no data: safe to rewrite
        }
      } else if (hasData)
        // the marker is written BEFORE the first data append, so bkt= dirs
        // without a marker can only mean the marker was deleted — the same
        // unrecoverable-count situation as a corrupt one
        throw new IllegalStateException(
          s"$tableDir holds bucketed data but its $marker marker is missing; " +
            "restore the original bucket count before further merges")
      else None
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val buckets = storedBuckets.getOrElse {
      // refuse a directory holding a pre-bucketing (flat) edge table:
      // appending bkt= dirs next to flat files corrupts the layout
      if (fs.exists(dir) &&
          fs.listStatus(dir).exists(st => st.getPath.getName.endsWith(".parquet")))
        throw new IllegalStateException(
          s"$tableDir holds an unbucketed edge table; migrate it before streaming merges")
      nBuckets
    }
    val incoming = batch
      .select(edgeCols.map(col): _*)
      .dropDuplicates(edgeCols)
      .withColumn("bkt",
        pmod(xxhash64(edgeCols.map(col): _*), lit(buckets.toLong)).cast("int"))
      .persist()
    try {
      if (!incoming.isEmpty) {
        val novel =
          if (hasData) {
            // ≤ buckets ints — tiny driver-side set that drives pruning
            val hit = incoming.select("bkt").distinct().collect().map(_.getInt(0))
            val table = spark.read.parquet(tableDir)
              .filter(col("bkt").isin(hit.toSeq: _*))
            incoming.join(table, edgeCols :+ "bkt", "left_anti")
          } else incoming
        if (storedBuckets.isEmpty) {
          // temp + rename: rename is the filesystem's atomicity primitive —
          // a crash mid-write can only leave the temp file, never a
          // partial/empty marker that would wedge every later micro-batch
          val tmp = new Path(dir, s"._graft_buckets.tmp")
          val out = fs.create(tmp, true)
          try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
          fs.delete(marker, false) // drop a corrupt empty marker if present
          if (!fs.rename(tmp, marker))
            throw new java.io.IOException(s"could not land bucket marker $marker")
        }
        novel.write.mode("append").partitionBy("bkt").parquet(tableDir)
      }
    } finally incoming.unpersist()
  }

  /** Convenience reader: the merged edge table without the layout column. */
  def readEdges(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir).select(edgeCols.map(col): _*)

  /** Compacts each bucket partition down to one file. Every micro-batch
    * appends at least one file per touched bucket, so a long-running
    * stream accumulates small files that tax both the namenode and every
    * scan — run this periodically (e.g. from a scheduled maintenance job,
    * with the stream idle: the rewrite is copy-then-swap per partition,
    * not transactional against concurrent appends).
    */
  def compact(spark: SparkSession, tableDir: String): Unit = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val bucketDirs = fs.listStatus(dir).filter(_.getPath.getName.startsWith("bkt="))
    bucketDirs.foreach { st =>
      // visible data files only: checksummed filesystems (LocalFileSystem)
      // shadow every data file with a hidden '.<name>.crc' sibling — counting
      // those would make a single-file bucket look compactable forever
      val files = fs.listStatus(st.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet") &&
          !f.getPath.getName.startsWith(".") && !f.getPath.getName.startsWith("_"))
      if (files.length > 1) {
        val tmp = new Path(dir, s".compact_${st.getPath.getName}")
        // dropDuplicates makes compaction self-healing: a crash between
        // landing the compacted file and deleting the originals leaves
        // duplicate rows, and the next compact run collapses them
        spark.read.parquet(st.getPath.toString)
          .dropDuplicates(edgeCols)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val dataFile = fs.listStatus(tmp)
          .find(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"compaction produced no file for $tmp"))
        // swap: land the compacted file first, then drop the originals —
        // a crash mid-swap leaves duplicates (re-runnable), never loss
        val landed = new Path(st.getPath, s"compacted-${System.nanoTime()}.parquet")
        if (!fs.rename(dataFile.getPath, landed))
          throw new java.io.IOException(s"compaction rename failed for ${st.getPath}")
        files.foreach(f => fs.delete(f.getPath, false))
        fs.delete(tmp, true)
      }
    }
  }
}
