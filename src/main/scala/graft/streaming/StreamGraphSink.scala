package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
object StreamGraphSink {

  private val edgeCols = Seq("src_label", "src", "dst_label", "dst", "rel")

  def start(edges: DataFrame, tableDir: String, checkpointDir: String): StreamingQuery =
    edges.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, tableDir)
      }
      .start()

  private[streaming] def mergeBatch(spark: SparkSession, batch: DataFrame, tableDir: String): Unit = {
    val incoming = batch.select(edgeCols.map(org.apache.spark.sql.functions.col): _*)
      .dropDuplicates(edgeCols)
    val novel =
      if (new java.io.File(tableDir).exists())
        incoming.join(spark.read.parquet(tableDir), edgeCols, "left_anti")
      else incoming
    novel.write.mode("append").parquet(tableDir)
  }
}
