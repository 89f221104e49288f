package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** State TTL on the `transformWithState` surface — the bounded-state
  * answer for the stateful-enrichment pattern at 100 TB: a production
  * profile keeps billions of keys only because dormant ones EXPIRE, so
  * the TTL path needs its own gate, not a note on [[RunningUserStats]].
  *
  * Two value states per key, differing ONLY in `TTLConfig`:
  *   - `total` — TTL far beyond the replay (hours): must behave exactly
  *     like the no-TTL twin, accumulating across every micro-batch;
  *   - `batch` — TTL of 1 ms: state-store TTL is PROCESSING-time based,
  *     and a micro-batch boundary always costs well over a millisecond
  *     (state commit + checkpoint + next-trigger planning), while reads
  *     and writes of one key inside a single `handleInputRows` call are
  *     sub-TTL by construction. So this cell is deterministically fresh
  *     within a batch and deterministically EXPIRED across batches —
  *     per-key per-batch aggregates, with re-admission after eviction
  *     starting from zero.
  *
  * The emitted row carries both: any silent TTL failure (the 1 ms cell
  * surviving a batch boundary) or over-eager expiry (the hours cell
  * dying) flips integer columns and fails the oracle hash. Exact cents
  * keep within-batch fold order invisible (x29 discipline).
  */
object TtlStates {

  final case class EventIn(user_id: Long, event_id: Long, cents: Long)
  final case class Tot(n: Long, sum: Long)
  final case class TtlStat(user_id: Long, n_total: Long, sum_total: Long,
      n_batch: Long, sum_batch: Long)

  final class Processor extends StatefulProcessor[Long, EventIn, TtlStat] {
    @transient private var total: ValueState[Tot] = _
    @transient private var batch: ValueState[Tot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      total = getHandle.getValueState[Tot]("total", Encoders.product[Tot],
        TTLConfig(java.time.Duration.ofHours(6)))
      batch = getHandle.getValueState[Tot]("batch", Encoders.product[Tot],
        TTLConfig(java.time.Duration.ofMillis(1)))
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[TtlStat] = {
      var t = if (total.exists()) total.get() else Tot(0L, 0L)
      // across a batch boundary this is ALWAYS expired -> fresh zero
      var b = if (batch.exists()) batch.get() else Tot(0L, 0L)
      rows.foreach { e =>
        t = Tot(t.n + 1, t.sum + e.cents)
        b = Tot(b.n + 1, b.sum + e.cents)
      }
      total.update(t)
      batch.update(b)
      Iterator.single(TtlStat(key, t.n, t.sum, b.n, b.sum))
    }
  }

  /** One row per active key per micro-batch: cumulative stats from the
    * long-TTL cell next to batch-local stats from the expired-every-
    * boundary cell. */
  def ttlStats(events: Dataset[EventIn]): Dataset[TtlStat] = {
    implicit val outEnc = Encoders.product[TtlStat]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
