package graft.queries

import graft.ops.CheckpointBlocks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of expensive MATERIALIZED intermediates shared by
  * more than one catalog query — the library-workflow answer to "x18 and x25
  * both need the LSH pair set; at 100 TB you compute it once".
  *
  * Producers `put` the frame they just materialized anyway (publishing costs
  * nothing extra); consumers `getOrCompute` so they still work standalone in
  * a session where the producer never ran. Keys embed the SparkContext
  * identity and the data directory, so one JVM serving several sessions or
  * scale factors never cross-wires frames.
  *
  * Storage hygiene: `liveRddIds` exposes the block ids backing the current
  * entries so an end-of-query sweep (`CheckpointBlocks.sweep`) can release
  * everything EXCEPT the shared frames; `clear()` + a final sweep at session
  * end releases those too. compute-once under concurrency comes from
  * ConcurrentHashMap.computeIfAbsent (Verify runs catalog queries on four
  * threads).
  */
object SharedCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val hitCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Number of `getOrCompute` calls served from the cache (build skipped)
    * since JVM start. A benchmark harness snapshots this around each query
    * to ANNOTATE cache-served timings: a query that consumed a published
    * frame excludes that frame's build cost, so its wall-clock is not
    * like-for-like against an engine that recomputes — the annotation keeps
    * cross-engine comparisons honest. */
  def hits: Long = hitCount.get()

  /** Canonical key for a frame derived from one data directory. The context
    * component is (applicationId, startTime) — monotonic per context — NOT
    * an identity hash: a JVM that stops its session and starts another must
    * never resolve a key to a frame bound to the dead context (RDD ids also
    * restart near 0 per context, so a stale entry's liveRddIds could
    * wrongly shield the new context's unrelated blocks from sweeps). */
  def key(spark: SparkSession, dir: String, what: String): String = {
    val sc = spark.sparkContext
    s"${sc.applicationId}@${sc.startTime}:$dir:$what"
  }

  /** Publish (producer side): overwrites any previous entry; the replaced
    * frame's blocks are left for the next sweep, NOT freed here — a consumer
    * holding the old frame may not have executed yet. */
  def put(k: String, df: DataFrame): DataFrame = { cache.put(k, df); df }

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Consume-or-build: at most one concurrent caller computes per key.
    * The build runs under a PER-KEY monitor, never inside the cache map's
    * own computeIfAbsent — shared frames derive from other shared frames
    * (lsh pairs → dedup mapping; cust-supp edges → capped edges → co
    * pairs), and ConcurrentHashMap.computeIfAbsent throws "Recursive
    * update" when a nested compute lands in the same bin. Monitor order
    * follows the derivation DAG (acyclic), so nested builds cannot
    * deadlock; a second caller for the same key blocks until the first
    * finishes, then reads the cached frame. */
  def getOrCompute(k: String)(build: => DataFrame): DataFrame = {
    val existing = cache.get(k)
    if (existing != null) { hitCount.incrementAndGet(); return existing }
    locks.computeIfAbsent(k, _ => new Object).synchronized {
      val again = cache.get(k)
      if (again != null) { hitCount.incrementAndGet(); again }
      else { val df = build; cache.put(k, df); df }
    }
  }

  /** RDD ids whose storage blocks back the live entries (checkpointed frames
    * plan to LogicalRDD leaves; reliable-checkpoint frames contribute none
    * and need none — their state is files). Entries bound to a STOPPED
    * context are evicted here rather than consulted: their RDD ids restart
    * near 0 in the next context and would wrongly shield unrelated blocks. */
  def liveRddIds: Set[Int] = {
    cache.entrySet().removeIf(e => e.getValue.sparkSession.sparkContext.isStopped)
    cache.values.toArray(Array.empty[DataFrame]).flatMap(CheckpointBlocks.rddIds).toSet
  }

  /** Also drops the per-key lock objects: lock identity only needs to be
    * stable within one getOrCompute race, and keeping them would grow the
    * map without bound across fixture dirs over a long-lived JVM. */
  def clear(): Unit = { cache.clear(); locks.clear() }
}
