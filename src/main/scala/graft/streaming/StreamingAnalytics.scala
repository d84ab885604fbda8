package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

// (session semantics are event-time throughout: processing-time timeouts
// make the engine trigger batches forever — `processAllAvailable` never
// quiesces — and make results depend on wall clock, which is exactly what
// a replayable 100 TB pipeline cannot afford)

/** Streaming analytics over an event stream (the streaming twins of the
  * batch queries q11/q23): event-time windowed aggregation under a
  * watermark, and custom sessionization state via flatMapGroupsWithState.
  *
  * Scale posture: state size is the thing to engineer. The windowed agg's
  * state is one row per (window, event_type) — bounded by the watermark,
  * which lets Spark drop windows older than the allowed lateness. The
  * sessionizer keeps one [[SessionState]] per ACTIVE user (not per event) and
  * the event-time timeout closes a session once the watermark passes its
  * last event + gap, so state is O(concurrent users), never O(history).
  * Both shuffle once, on their grouping key.
  */
object StreamingAnalytics {

  /** An input event (mirrors the `events` table schema). */
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** A closed (or flushed) user session. */
  final case class Session(
      user_id: Long,
      started: Timestamp,
      ended: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Running state per user. */
  final case class SessionState(started: Long, ended: Long, n: Long, total: Double)

  /** Tumbling event-time window counts per event_type, tolerating
    * `lateness` of out-of-order data. Late rows beyond the watermark are
    * DROPPED (counted windows finalize); that is the correctness/latency
    * trade every streaming agg makes explicit.
    */
  def windowedCounts(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("total_value"))

  /** Streaming exact dedup on an id column: duplicates arriving within the
    * watermark horizon are dropped, and state for ids older than the
    * watermark is evicted — bounded state, unlike a naive dropDuplicates
    * whose seen-set grows forever. This is the streaming half of the exact
    * dedup story (x01 is the batch half): an at-least-once upstream (kafka
    * retries, file re-deliveries) becomes effectively-once downstream.
    */
  def dedupEvents(events: DataFrame, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based session aggregation with the BUILT-IN session_window —
    * preference order says compose existing ops when semantics allow, and
    * they do: Spark merges overlapping per-event windows into sessions and
    * the watermark closes them. One shuffle on (user_id).
    */
  def sessionWindowStats(events: DataFrame, gap: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("started"),
        col("session_window.end").as("ended"),
        col("n_events"),
        col("total_value"))

  /** Stream-stream interval join: attribute each purchase to the clicks
    * the same user made within `horizon` BEFORE it. Both sides carry
    * watermarks and the join condition bounds the time skew, so Spark can
    * evict join state older than (watermark - horizon) — without the
    * interval bound, stream-stream join state grows forever.
    */
  def attribution(events: DataFrame, lateness: String, horizon: String): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("purchase_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", lateness)
    clicks.join(
      purchases,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(
        col("purchase_user").as("user_id"),
        col("click_ts"),
        col("purchase_ts"),
        col("value"))
  }

  /** Gap-based sessionization with EXPLICIT state (the custom-state escape
    * hatch for session logic session_window can't express — e.g. emitting
    * the first/last event payloads, or capping session length). A session
    * closes when the WATERMARK passes its last event + `gapMs`
    * (EventTimeTimeout), so results are a pure function of the data, and
    * the state store holds one entry per OPEN session.
    */
  def sessionize(events: Dataset[Event], gapMs: Long, lateness: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, new Timestamp(s.started), new Timestamp(s.ended), s.n, s.total))
          } else {
            // walk the batch's events in event-time order, CLOSING the open
            // session whenever the next event is more than gapMs after it —
            // sessions can split inside a batch, not only via the timeout
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.ended > gapMs =>
                  closed += Session(
                    userId, new Timestamp(s.started), new Timestamp(s.ended), s.n, s.total)
                  open = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(SessionState(
                    math.min(s.started, t), math.max(s.ended, t), s.n + 1, s.total + e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // a timeout timestamp must sit beyond the current watermark
              // (events can arrive with ended+gap already passed)
              state.setTimeoutTimestamp(
                math.max(s.ended + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }
}
