package graft.ops

import org.apache.spark.sql.Dataset
import java.util.concurrent.atomic.AtomicLong

/** Batched, resumable external sink — the Spark replacement for the
  * reference's `run_cypher_file` (/root/reference/main.py:304-330): it read a
  * statement file, chunked into `batch_size` transactions, and resumed from a
  * batch `offset`.
  *
  * Differences by design:
  *  - every statement in a batch is delivered (the reference's slice
  *    off-by-one silently dropped the last statement of each 1000-statement
  *    batch — main.py:319-324; documented, not replicated);
  *  - batching happens per partition via `foreachPartition` with one client
  *    per partition, so the sink scales with executors instead of a single
  *    serial bolt session;
  *  - resume is ledger-based: the caller passes the set of batch ids already
  *    committed (from a previous run's ledger) and those batches are skipped.
  *
  * Batch id = (partitionId, indexWithinPartition) — deterministic for a
  * deterministically-partitioned input (e.g. sorted + repartitionByRange).
  */
object BatchedSink {

  final case class BatchId(partition: Int, index: Long) {
    override def toString = s"$partition:$index"
  }

  /** Writes `rows` in batches of `batchSize`. `send` is invoked once per
    * batch (the "transaction"); `committed` batches are skipped (resume).
    * Returns the number of batches attempted (driver-side counter is for
    * logging/tests only). */
  def write[T](
      rows: Dataset[T],
      batchSize: Int,
      send: (BatchId, Seq[T]) => Unit,
      committed: Set[String] = Set.empty): Long = {
    require(batchSize > 0, "batchSize must be positive")
    val attempted = rows.sparkSession.sparkContext.longAccumulator("graft.sink.batches")
    val skip = committed // serialized into the closure
    rows.foreachPartition { (it: Iterator[T]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var idx = 0L
      it.grouped(batchSize).foreach { batch =>
        val id = BatchId(pid, idx)
        if (!skip.contains(id.toString)) {
          send(id, batch)
          attempted.add(1)
        }
        idx += 1
      }
    }
    attempted.value
  }

  /** Resumable write with an on-disk ledger ([[BatchLedger]]): loads the
    * committed set from `ledgerDir`, skips those batches, and drops a marker
    * after each successful `send` — so a crashed run resumes by calling this
    * again with the same ledgerDir, re-sending only uncommitted batches
    * (at-least-once: a crash between send and marker re-sends that batch).
    */
  def writeResumable[T](
      rows: Dataset[T],
      batchSize: Int,
      send: (BatchId, Seq[T]) => Unit,
      ledgerDir: String): Long = {
    val spark = rows.sparkSession
    val committed = BatchLedger.load(spark, ledgerDir)
    val bundle = BatchLedger.bundle(spark)
    write[T](rows, batchSize, (id, batch) => {
      send(id, batch)
      BatchLedger.record(bundle, ledgerDir, id)
    }, committed)
  }
}
