package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** MapState × ListState × TTL'd ValueState in ONE `transformWithState`
  * processor on ONE RocksDB store — the per-key SUBMAP shape a 100 TB
  * enrichment pipeline actually holds: per-user per-CATEGORY rollups
  * updated by POINT lookups (`containsKey`/`getValue`/`updateValue` on
  * the touched categories only — never serializing the whole map per
  * update, the reason MapState exists), next to an append-only
  * ListState sequence (one element per active micro-batch) and a
  * 1 ms-TTL ValueState proving store-enforced expiry still happens on a
  * store that also carries map and list column families ([[TtlStates]]/
  * [[TtlTimerSessions]] gate TTL next to value state and timers; this
  * is the remaining primitive pair).
  *
  * Per input batch each active key emits:
  *   - one `kind='cat'` row PER CATEGORY IN THE MAP (a full map
  *     iteration — the cross-batch cumulative (n, cents) per category,
  *     so a category quiet in this batch re-emits its standing rollup:
  *     deterministic duplicate rows the oracle reproduces);
  *   - one `kind='list'` row: (list length, sum of elements, FIRST
  *     element, TTL'd per-batch count). Length/sum/head pin append
  *     ORDER and content; the d column is the 1 ms-TTL face
  *     (deterministically the per-batch aggregate under paced
  *     triggers).
  *
  * Scale: map entries ∝ distinct categories per key (bounded), list
  * length ∝ active batches (bounded by retention in production — a
  * deployment caps it with put()), TTL cell fixed-width. Every update
  * is point-wise, so per-row cost is O(batch contribution), not
  * O(accumulated state).
  */
object MapListStates {

  final case class EventIn(user_id: Long, event_type: String, cents: Long)
  final case class Tot(n: Long, sum: Long)
  final case class Out(user_id: Long, kind: String, cat: String,
      a: Long, b: Long, c: Long, d: Long)

  final class Processor extends StatefulProcessor[Long, EventIn, Out] {
    @transient private var cats: MapState[String, Tot] = _
    @transient private var seqs: ListState[Long] = _
    @transient private var batch: ValueState[Tot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cats = getHandle.getMapState[String, Tot]("cats", Encoders.STRING,
        Encoders.product[Tot], TTLConfig.NONE)
      seqs = getHandle.getListState[Long]("seqs", Encoders.scalaLong,
        TTLConfig.NONE)
      batch = getHandle.getValueState[Tot]("batch", Encoders.product[Tot],
        TTLConfig(java.time.Duration.ofMillis(1)))
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[Out] = {
      // this batch's per-category rollup (bounded by category cardinality)
      val m = scala.collection.mutable.HashMap.empty[String, Tot]
      var n = 0L
      var sum = 0L
      rows.foreach { e =>
        n += 1; sum += e.cents
        val p = m.getOrElse(e.event_type, Tot(0L, 0L))
        m(e.event_type) = Tot(p.n + 1L, p.sum + e.cents)
      }
      if (n == 0L) return Iterator.empty
      // MapState: point updates on the touched categories only
      m.foreach { case (c, t) =>
        val prev = if (cats.containsKey(c)) cats.getValue(c) else Tot(0L, 0L)
        cats.updateValue(c, Tot(prev.n + t.n, prev.sum + t.sum))
      }
      // ListState: append this batch's event count (order = batch order)
      seqs.appendValue(n)
      // TTL'd ValueState: expired between paced batches → per-batch fresh
      val b = {
        val prev = if (batch.exists()) batch.get() else Tot(0L, 0L)
        Tot(prev.n + n, prev.sum + sum)
      }
      batch.update(b)
      // emit the FULL map (iteration across the map column family) + the
      // list face; the list is bounded (≤ staged batches), safe to drain
      val lst = seqs.get().toArray
      val mapRows = cats.iterator().map { case (c, t) =>
        Out(key, "cat", c, t.n, t.sum, 0L, 0L)
      }
      mapRows ++ Iterator.single(
        Out(key, "list", "", lst.length.toLong, lst.sum, lst.head, b.n))
    }
  }

  /** Processing-time mode (TTL's only legal TimeMode), append output. */
  def run(events: Dataset[EventIn]): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
