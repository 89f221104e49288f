package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running aggregates on Spark 4's arbitrary-state API
  * (`transformWithState` / `StatefulProcessor`) — the successor to
  * [[StatefulEnrichment]]'s `flatMapGroupsWithState`: typed state cells
  * with independent TTLs in the RocksDB-backed store instead of one
  * monolithic state object.
  *
  * The op: per user, a running (event count, exact cents sum, cents max)
  * emitted once per key per micro-batch. Values are quantized to cents
  * (x29's exact-integer discipline), so the running sum is
  * order-independent — the processor's output is deterministic however
  * the batch planner orders rows within a group.
  *
  * Scale posture: state is one fixed-width row per user in the state
  * store (RocksDB spills to disk, nothing driver-side); emission is one
  * row per ACTIVE key per batch, not per event. A production deployment
  * adds a `TTLConfig` to expire dormant keys; the gate keeps NONE so the
  * batch twin is exactly comparable.
  */
object RunningUserStats {

  final case class EventIn(user_id: Long, event_id: Long, cents: Long)
  final case class UserStat(user_id: Long, n_events: Long, sum_cents: Long, max_cents: Long)

  final class Processor extends StatefulProcessor[Long, EventIn, UserStat] {
    @transient private var st: ValueState[UserStat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserStat]("stat", Encoders.product[UserStat], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[UserStat] = {
      var s =
        if (st.exists()) st.get()
        else UserStat(key, 0L, 0L, Long.MinValue)
      rows.foreach { e =>
        s = UserStat(key, s.n_events + 1, s.sum_cents + e.cents, math.max(s.max_cents, e.cents))
      }
      st.update(s)
      Iterator.single(s)
    }
  }

  /** Works on both a streaming and a batch Dataset (Spark runs the same
    * processor in batch mode with transient state). */
  def runningStats(events: Dataset[EventIn]): Dataset[UserStat] = {
    implicit val outEnc = Encoders.product[UserStat]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
