package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming operators over an `events`-shaped stream
  * (event_id, ts, user_id, event_type, value). The reference has no
  * streaming (its closest analog is the exchange heartbeat/requeue
  * protocol — /root/reference/DEV_NOTES.md:215-268 sketches stream
  * generators as a future idea); these are the Spark-native slot for
  * that direction: watermarked event-time windows + keyed state.
  *
  * Scale stance: all operators are keyed by user_id/window, so state
  * is hash-partitioned across executors; watermarks bound state size
  * (late data beyond the watermark is dropped, state for closed
  * windows/sessions is freed). The same code runs on a file stream,
  * Kafka, or MemoryStream (used by the spec).
  */
object EventStream {

  /** Tumbling event-time window aggregation with a watermark. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window per-user rate (10 min slide over 1 h windows). */
  def slidingUserRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact deduplication — the ingest-side twin of
    * TextDedup.exact: drop events whose key (here event_id; for a
    * document stream, a content fingerprint) was already seen. State
    * is hash-partitioned by key and bounded by the watermark: a key
    * older than the delay is dropped from the store, so the state size
    * tracks the late-data horizon, not the stream's history. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: enrich a click stream with the
    * matching view within the join window. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * each side's buffered state is evictable — the
    * unbounded-state-stream-join footgun is structurally avoided. */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
      .withWatermark("v_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "1 hour")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES"))
  }

  /** Stream-static enrichment join: the event stream against a static
    * dimension (here a per-user tier snapshot). The static side is
    * re-planned per micro-batch, so Catalyst broadcasts it when small
    * — no stream-side state at all (unlike stream-stream joins, a
    * static dimension needs no watermark bookkeeping). At 100 TB the
    * dimension lives in the warehouse and each micro-batch sees its
    * current snapshot. */
  def enrichWithDimension(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Declarative sessionization via the built-in `session_window`
    * (gap-based event-time sessions) — the Catalyst-native counterpart
    * of [[sessionize]]'s custom keyed state: watermark-bounded state,
    * merged sessions, no user state-management code. Prefer this when
    * per-session logic is pure aggregation; drop to
    * flatMapGroupsWithState only for semantics aggregates can't
    * express (the reference-roadmap "custom operator" slot). */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("user_id"), col("n_events"), col("sum_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                           n_events: Long, sum_value: Double)

  /** Session window per user with an inactivity gap: custom keyed
    * state via flatMapGroupsWithState (the reference-roadmap "custom
    * operator" slot, expressed the Spark-native way). A session closes
    * either when a later event arrives past the gap (emitted in-batch)
    * or, with the default ProcessingTimeTimeout, when the timeout
    * fires after `gapMs` of inactivity. Tests pass NoTimeout so
    * MemoryStream micro-batches terminate deterministically. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 timeoutConf: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeoutConf == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapMs)
            }
            out.result().iterator
          }
      }
  }
}
