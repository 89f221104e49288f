package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms for the event stream — the streaming
  * forms of the batch analogs q23 (sessionize) and q24 (tumbling window).
  * Both take a (possibly streaming) DataFrame with (user_id, ts, event_type,
  * value) and work identically on batch frames, which is how the specs
  * cross-check them.
  *
  * The reference has no streaming at all — its offset-resume loops
  * (/root/reference/main.py:304,318,341-346) are the moral equivalent of
  * checkpointed offsets, which Structured Streaming provides natively.
  */
object StreamingOps {

  /** Session aggregation via session_window (gap-based), watermarked for
    * state eviction on true streams. */
  def sessionize(events: DataFrame, gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("sw.end").as("session_end"), col("n_events"))
  }

  /** Tumbling-window counts per event type, watermarked. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
  }

  /** Streaming dedup on a business key within the watermark horizon —
    * the streaming form of exact dedup (x01). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    if (events.isStreaming) src.dropDuplicatesWithinWatermark(keyCols)
    else src.dropDuplicates(keyCols)
  }

  /** Watermarked stream-STREAM interval join: each left event pairs with
    * the same user's right-side events landing within (0, window] after
    * it — funnel/attribution analysis as a streaming join.
    *
    * State-boundedness is the whole design: BOTH sides carry a watermark
    * and the join condition bounds r_ts to a finite interval around l_ts,
    * which is exactly what lets Structured Streaming compute how long a
    * buffered row can still match and EVICT it — an equi-only
    * stream-stream join would grow join state forever. Works identically
    * on batch frames (how the spec cross-checks it). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val l = wm(left).select(
      col("user_id"), col("ts").as("l_ts"),
      col("event_type").as("l_type"), col("event_id").as("l_id"))
    val r = wm(right).select(
      col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_type").as("r_type"), col("event_id").as("r_id"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_type"), col("r_type"), col("l_ts"), col("r_ts"))
  }
}
