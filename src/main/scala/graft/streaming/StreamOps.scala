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
    * session, mirroring the batch `Events.sessionize` semantics.
    *
    * `watermarkDelayMs` (default = `gapMs`) bounds how late an event
    * may arrive and still be sessionized; it is a parameter precisely
    * because it must be reasoned about together with the gap.
    * Within a micro-batch, sessions are computed by a true interval
    * merge over {carried state} ∪ {batch events}, so a within-watermark
    * late event either extends the open session backward OR forms its
    * own earlier session when it is more than `gapMs` away — matching
    * `Events.sessionize` on the same data. Known divergence from batch
    * (inherent to incremental emission): a closed earlier session is
    * emitted at batch granularity and cannot absorb an even-later
    * straggler from a subsequent batch; only the latest session stays
    * open in state. */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelayMs: Option[Long] = None): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val delayMs = watermarkDelayMs.getOrElse(gapMs)

    events
      .withWatermark("ts", s"$delayMs milliseconds")
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
            // Interval merge with gap tolerance over the carried session
            // plus every batch event (each a single-point session):
            // sorted by start, adjacent pieces within gapMs coalesce.
            val pieces = (state.getOption.toList ++
                rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value)))
              .sortBy(s => (s.startMs, s.endMs))
            val merged = pieces.foldLeft(List.empty[SessionState]) {
              case (cur :: done, p) if p.startMs - cur.endMs <= gapMs =>
                SessionState(cur.startMs, math.max(cur.endMs, p.endMs),
                  cur.n + p.n, cur.total + p.total) :: done
              case (acc, p) => p :: acc
            }.reverse
            // all but the latest session are final: nothing still in
            // flight (within watermark) can bridge into them this batch
            val closedSessions = merged.init.map(s =>
              SessionUpdate(userId, new Timestamp(s.startMs), new Timestamp(s.endMs),
                s.n, s.total, closed = true))
            val open = merged.last
            if (open.endMs + gapMs <= state.getCurrentWatermarkMs()) {
              // the gap already elapsed in event time (this key's whole
              // batch was late): close inline — a timeout at or below
              // the watermark would be rejected and never fire anyway
              state.remove()
              (closedSessions :+ SessionUpdate(userId, new Timestamp(open.startMs),
                new Timestamp(open.endMs), open.n, open.total, closed = true)).iterator
            } else {
              state.update(open)
              state.setTimeoutTimestamp(open.endMs + gapMs)
              closedSessions.iterator
            }
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
