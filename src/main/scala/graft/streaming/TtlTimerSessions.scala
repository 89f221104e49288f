package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** TTL × timers in ONE processor on ONE state store — the combination a
  * production 100 TB deployment actually runs ([[TtlStates]] gates TTL
  * alone, [[SessionTimers]] timers alone; provider-specific expiry
  * behavior is exactly where silent semantic drift would hide, so the
  * combination gets its own gate).
  *
  * Platform facts this gate encodes (both probed on Spark 4.1.2):
  * `transformWithState` cannot run on the HDFS-backed heap provider at
  * all (multiple column families unsupported), and state TTL is
  * PROCESSING-time-only (`STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_
  * ASSIGN_TTL` under TimeMode.EventTime) — so TTL and EVENT-time timers
  * cannot coexist; the coexisting pair is TTL + PROCESSING-time timers,
  * and that is what runs here, in TimeMode.ProcessingTime.
  *
  * Per key, four state cells and one timer stream:
  *   - `total` — long-TTL (hours) counter: accumulates across every
  *     micro-batch, proving TTL does not over-expire next to timers;
  *   - `batch` — 1 ms-TTL counter: deterministically the per-batch
  *     aggregate ([[TtlStates]] semantics), proving expiry still happens
  *     with timers registered on the same store;
  *   - `run` / `runSeq` — the timer face: a key active in a batch
  *     registers a processing-time timer 1 ms ahead, which fires in the
  *     FIRST later micro-batch (paced triggers are ≥ 500 ms apart)
  *     unless that batch brought new input for the key — input is
  *     processed BEFORE timers, and the handler deletes the stale timer
  *     ([[SessionTimers]]'s mechanism). So a "run" closes at the first
  *     batch boundary where the key goes quiet: runs are exactly the
  *     maximal sequences of CONSECUTIVE staged batches containing the
  *     key — a deterministic, batch-arithmetic fact the oracle computes
  *     with gaps-and-islands. The trailing no-data batch the paced gate
  *     always drains fires the final runs' timers.
  *
  * Output rows are tagged unions (`kind` = 'ttl' | 'sess') so both faces
  * stay hash-comparable in one append stream:
  *   - ttl:  (a, b, c, d) = (n_total, sum_total, n_batch, sum_batch)
  *   - sess: (a, b, c, d) = (run_seq, n_run, sum_run, 0)
  */
object TtlTimerSessions {

  final case class EventIn(user_id: Long, event_id: Long, cents: Long)
  final case class Tot(n: Long, sum: Long)
  final case class RunSeq(seq: Long)
  final case class PendingTimer(expiry: Long)
  final case class Out(user_id: Long, kind: String, a: Long, b: Long, c: Long, d: Long)

  final class Processor extends StatefulProcessor[Long, EventIn, Out] {
    @transient private var total: ValueState[Tot] = _
    @transient private var batch: ValueState[Tot] = _
    @transient private var run: ValueState[Tot] = _
    @transient private var runSeq: ValueState[RunSeq] = _
    @transient private var pending: ValueState[PendingTimer] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      total = getHandle.getValueState[Tot]("total", Encoders.product[Tot],
        TTLConfig(java.time.Duration.ofHours(6)))
      batch = getHandle.getValueState[Tot]("batch", Encoders.product[Tot],
        TTLConfig(java.time.Duration.ofMillis(1)))
      run = getHandle.getValueState[Tot]("run", Encoders.product[Tot],
        TTLConfig.NONE)
      runSeq = getHandle.getValueState[RunSeq]("runSeq",
        Encoders.product[RunSeq], TTLConfig.NONE)
      pending = getHandle.getValueState[PendingTimer]("pending",
        Encoders.product[PendingTimer], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[Out] = {
      var n = 0L
      var sum = 0L
      rows.foreach { e => n += 1; sum += e.cents }
      if (n == 0L) return Iterator.empty
      // TTL face: long cell accumulates, 1 ms cell is per-batch fresh
      val t = {
        val prev = if (total.exists()) total.get() else Tot(0L, 0L)
        Tot(prev.n + n, prev.sum + sum)
      }
      val b = {
        val prev = if (batch.exists()) batch.get() else Tot(0L, 0L)
        Tot(prev.n + n, prev.sum + sum)
      }
      total.update(t)
      batch.update(b)
      // timer face: extend the open run; the stale timer (registered by
      // the previous batch, firing this one) is deleted BEFORE the timer
      // phase runs — input-before-timers, SessionTimers' mechanism
      val r = {
        val prev = if (run.exists()) run.get() else Tot(0L, 0L)
        Tot(prev.n + n, prev.sum + sum)
      }
      run.update(r)
      if (pending.exists()) getHandle.deleteTimer(pending.get().expiry)
      val expiry = timerValues.getCurrentProcessingTimeInMs() + 1L
      getHandle.registerTimer(expiry)
      pending.update(PendingTimer(expiry))
      Iterator.single(Out(key, "ttl", t.n, t.sum, b.n, b.sum))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] = {
      if (run.exists()) {
        val r = run.get()
        val seq = (if (runSeq.exists()) runSeq.get().seq else 0L) + 1L
        run.clear()
        runSeq.update(RunSeq(seq))
        pending.clear()
        Iterator.single(Out(key, "sess", seq, r.n, r.sum, 0L))
      } else Iterator.empty
    }
  }

  /** Processing-time mode (the only TimeMode where TTL is legal), append
    * output; replay under a paced trigger so no-data batches fire the
    * final timers. */
  def run(events: Dataset[EventIn]): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
