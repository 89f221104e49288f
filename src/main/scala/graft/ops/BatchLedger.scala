package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Persistent commit ledger for [[BatchedSink]] — completes the reference's
  * resume-from-offset story (/root/reference/main.py:318,408) end-to-end: the
  * reference recorded a batch offset and restarted from it; here each
  * committed batch leaves a marker file on any Hadoop-compatible filesystem
  * (local, HDFS, S3A — never java.io.File), and a resumed run loads the set
  * and skips.
  *
  * Layout under `dir`:
  *  - `<partition>-<index>.done` — empty marker per committed batch, created
  *    AFTER the batch's send returns. A crash between send and marker means
  *    that one batch re-sends on resume: at-least-once, the standard external
  *    sink contract (exactly-once would need the sink itself transactional).
  *  - `_compacted` — newline-separated batch ids folded by [[compact]].
  *    Millions of tiny markers strain a real namenode; compaction after a
  *    completed run keeps the steady-state ledger at one file.
  */
object BatchLedger {
  private val Marker = """(\d+)-(\d+)\.done""".r

  /** Hadoop `Configuration` is not `Serializable`; capture its entries
    * driver-side and rebuild lazily on the executor (public-API stand-in for
    * Spark's internal SerializableConfiguration). */
  final class ConfBundle(@transient conf: Configuration) extends Serializable {
    private val entries: Array[(String, String)] =
      conf.iterator.asScala.map(e => (e.getKey, e.getValue)).toArray
    @transient lazy val value: Configuration = {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
  }

  def bundle(spark: SparkSession): ConfBundle =
    new ConfBundle(spark.sparkContext.hadoopConfiguration)

  /** Committed batch ids ("partition:index"): markers ∪ compacted file. */
  def load(spark: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Set.empty
    val markers = fs.listStatus(p).iterator.flatMap { st =>
      st.getPath.getName match {
        case Marker(pid, idx) => Some(s"$pid:$idx")
        case _                => None
      }
    }.toSet
    markers ++ readCompacted(fs, p)
  }

  private def readCompacted(fs: FileSystem, dir: Path): Set[String] = {
    // The tmp file is the fallback for a crash inside compact() between
    // delete(_compacted) and the rename: tmp always holds a superset of
    // the deleted file's ids at that point, so no commit record is lost.
    // Records are only trusted if newline-TERMINATED: a crash mid-write
    // can truncate the final line to a prefix of a real id ("0:12" →
    // "0:1"), which would fabricate a commit record and skip a batch that
    // was never sent. Dropping an unterminated tail only loses records —
    // safe, it just re-sends.
    Seq(new Path(dir, "_compacted"), new Path(dir, "_compacted.tmp"))
      .filter(fs.exists)
      .flatMap { p =>
        val in = fs.open(p)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val terminated =
          if (content.endsWith("\n")) content
          else content.substring(0, content.lastIndexOf('\n') + 1)
        terminated.split("\n").iterator.filter(_.nonEmpty).toList
      }.toSet
  }

  /** Executor-side: drop the marker for a just-committed batch. */
  def record(bundle: ConfBundle, dir: String, id: BatchedSink.BatchId): Unit = {
    val p = new Path(dir, s"${id.partition}-${id.index}.done")
    val fs = p.getFileSystem(bundle.value)
    fs.create(p, true).close()
  }

  /** Fold all markers into `_compacted` and delete them. Crash-safe via
    * the tmp file: it is written first with the full id set, and load()
    * reads it as a fallback, so the delete→rename window cannot lose
    * commit records. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val all = load(spark, dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (all.isEmpty && !fs.exists(p)) return
    val tmp = new Path(p, "_compacted.tmp")
    val out = fs.create(tmp, true)
    try out.write((all.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(p, "_compacted")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"ledger compact rename failed: $tmp -> $dst")
    fs.listStatus(p).foreach { st =>
      if (Marker.matches(st.getPath.getName)) fs.delete(st.getPath, false)
    }
  }
}
