package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2 group 8): the streaming
  * twins of the batch Events/Snapshot operators.
  *
  * Scale notes: state is keyed by user/business key and partitioned by
  * the shuffle on `groupByKey` — state volume per executor is bounded
  * by keyspace/cluster-size, and watermarks bound retention. Both
  * operators run identically on a 1000-executor cluster; nothing below
  * assumes local mode.
  */
object StreamOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionUpdate(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double,
      closed: Boolean)

  // top-level-visible state class (codegen instantiates it from
  // generated Java; `private` and a field named `sum` both break it)
  case class SessionState(startMs: Long, endMs: Long, n: Long, total: Double)

  /** Gap-based streaming sessionization via flatMapGroupsWithState:
    * a session closes after `gapMs` of event-time inactivity (driven
    * by the event-time watermark). Emits one update per closed
    * session, mirroring the batch `Events.sessionize` semantics. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, new Timestamp(s.startMs), new Timestamp(s.endMs),
              s.n, s.total, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closedSessions = List.empty[SessionUpdate]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  // min() on start: a late-but-within-watermark event may
                  // precede the current session start
                  cur = Some(SessionState(math.min(s.startMs, t), math.max(s.endMs, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closedSessions ::= SessionUpdate(userId, new Timestamp(s.startMs),
                    new Timestamp(s.endMs), s.n, s.total, closed = true)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closedSessions.reverseIterator
          }
      }
  }

  /** Streaming incremental-snapshot ingest: watermarked dedup by
    * business key (first-writer-wins within the watermark horizon),
    * then append — the readStream→dedup→sink shape of a continuous
    * backup pipeline. */
  def incrementalSnapshot(updates: DataFrame, keyCol: String, tsCol: String): DataFrame =
    updates
      .withWatermark(tsCol, "10 minutes")
      .dropDuplicatesWithinWatermark(keyCol)

  /** Tumbling event-time window aggregate — streaming twin of
    * `ev_tumbling` (1-day windows, per event type). */
  def tumblingCounts(events: DataFrame, window_ : String = "1 day"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
