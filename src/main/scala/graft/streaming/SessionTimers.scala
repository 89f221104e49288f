package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-sessionization on Spark 4's arbitrary-state API with EVENT-TIME
  * TIMERS — the timer half of the `transformWithState` surface
  * [[RunningUserStats]] opened (that gate exercises typed ValueState;
  * this one exercises `registerTimer`/`handleExpiredTimer`, the API a
  * production pipeline uses to close idle state instead of holding it
  * forever).
  *
  * The op: per user, merge events into gap-sessions (a new event more
  * than `GapUs` after the open session's end closes it and starts a new
  * one — q23's `>` convention); the open session re-registers an idle
  * timer at `end + gap` on every extension, and when the WATERMARK
  * passes that expiry the timer fires, emits the session, and clears
  * state. Spark processes a batch's input rows BEFORE its timers, so a
  * session extended by this batch never sees its own stale timer (the
  * processor deletes the old expiry and registers the new one).
  *
  * Determinism contract (what lets the catalog gate hash-compare this):
  * input-before-timers means every session closed by a LATER EVENT has
  * batch-independent boundaries — exactly batch gap-sessionization —
  * and timer arithmetic only decides (a) WHICH batch emits an
  * event-closed session's user-went-idle sibling (invisible: the
  * emitted row is identical) and (b) whether each user's LAST session
  * is emitted at all: it is iff its expiry ms (`(end_us + gap) / 1000`,
  * floor) is <= the final watermark — `ms_trunc(max event time) −
  * delay`, which the trailing AvailableNow flush batch applies
  * (boundary pinned by SessionTimersSpec with an exact-tie fixture).
  *
  * Scale posture: one fixed-width Open row + one timer per ACTIVE user
  * in the RocksDB store; timers are the eviction mechanism itself, so
  * state is bounded by gap × arrival rate, not by history — the shape
  * that keeps a week-long 100 TB stream's state flat.
  */
object SessionTimers {

  /** 30-minute session gap, in microseconds of event time. */
  val GapUs: Long = 1800L * 1000000L

  final case class EventIn(user_id: Long, event_id: Long, ts: java.sql.Timestamp, us: Long)
  final case class OpenSession(user_id: Long, start_us: Long, end_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  private def expiryMs(endUs: Long): Long = (endUs + GapUs) / 1000L

  final class Processor extends StatefulProcessor[Long, EventIn, SessionOut] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // Arrival order within a micro-batch is partition-racy; event-time
      // order (with the id tiebreak) is what makes the fold deterministic.
      val sorted = rows.toArray.sortBy(e => (e.us, e.event_id))
      val outs = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur: OpenSession = if (open.exists()) open.get() else null
      val hadOpen = cur != null
      val oldExpiry = if (hadOpen) expiryMs(cur.end_us) else 0L
      sorted.foreach { e =>
        if (cur == null) cur = OpenSession(key, e.us, e.us, 1L)
        else if (e.us - cur.end_us > GapUs) {
          outs += SessionOut(key, cur.start_us, cur.end_us, cur.n)
          cur = OpenSession(key, e.us, e.us, 1L)
        } else cur = OpenSession(key, cur.start_us, math.max(cur.end_us, e.us), cur.n + 1L)
      }
      if (sorted.nonEmpty) {
        if (hadOpen && oldExpiry != expiryMs(cur.end_us)) getHandle.deleteTimer(oldExpiry)
        getHandle.registerTimer(expiryMs(cur.end_us))
        open.update(cur)
      }
      outs.iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (open.exists()) {
        val cur = open.get()
        // Fire only the timer that belongs to the CURRENT open session; a
        // stale expiry (session since extended in this very batch) is a
        // no-op — the fresh timer owns the close.
        if (expiredTimerInfo.getExpiryTimeInMs() == expiryMs(cur.end_us)) {
          open.clear()
          Iterator.single(SessionOut(key, cur.start_us, cur.end_us, cur.n))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Requires `events` to carry a watermark on `ts` (event time); emits
    * each closed session exactly once, in append mode. */
  def sessions(events: Dataset[EventIn]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
