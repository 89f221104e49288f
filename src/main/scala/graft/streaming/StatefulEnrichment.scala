package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key stream processing via flatMapGroupsWithState — the
  * streaming-native form of the reference's resumable offset loops
  * (/root/reference/main.py:341-348): state lives in the checkpointed state
  * store instead of a hand-carried offset.
  *
  * The op: per user, emit each event annotated with how many events this
  * user has produced so far and whether the user was seen before — the
  * "have I already enriched this entity" bookkeeping the reference did by
  * re-reading its own output file.
  */
object StatefulEnrichment {

  final case class EventIn(user_id: Long, event_id: Long)
  final case class EventOut(user_id: Long, event_id: Long, seq_in_user: Long, first_seen: Boolean)

  def annotate(events: Dataset[EventIn]): Dataset[EventOut] = {
    implicit val outEnc = Encoders.product[EventOut]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[EventIn], state: GroupState[Long]) => {
          var seen = state.getOption.getOrElse(0L)
          val wasNew = seen == 0L
          val out = rows.toSeq.sortBy(_.event_id).zipWithIndex.map { case (e, i) =>
            EventOut(user, e.event_id, seen + i + 1, wasNew && i == 0)
          }
          seen += out.size
          state.update(seen)
          out.iterator
        })
  }
}
