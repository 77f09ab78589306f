package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Fx._
import graft.sources.Tables

/** Event / time-series operators (SURVEY §2 group 6): tumbling-window
  * aggregation, gap-based sessionization, cohort retention. The batch
  * shapes here mirror graft.streaming — same semantics, one shuffle on
  * (type|user) keys, partial aggregation map-side.
  *
  * Event timestamps are ns in parquet; Spark reads µs. All raw-ts
  * outputs are epoch-microsecond BIGINTs so engines agree (SURVEY §4).
  */
object Events {

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * user inactivity. Pure window functions — one shuffle on user_id. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(decV(col("value"))).cast(DoubleType), 4).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type")
    },

    "ev_sessionize" -> { (s, d) =>
      sessionize(Tables.events(s, d), 1800L)
        .groupBy("user_id", "session_seq")
        .agg(
          count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("session_start"),
          max(unix_micros(col("ts"))).as("session_end"),
          round(sum(decV(col("value"))).cast(DoubleType), 4).as("sum_value"))
        .orderBy("user_id", "session_seq")
    },

    "ev_retention" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("cohort_day"),
          count(lit(1)).as("n_events"))
        .groupBy("cohort_day")
        .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
        .orderBy("cohort_day")
    },

    "ev_funnel" -> { (s, d) =>
      // Range-join shape: purchases semi-joined to clicks of the same
      // user within a trailing 30-minute window (equi on user + range
      // on time — the equi key carries the shuffle; the range is a
      // join-condition filter, never a cross product).
      val ev = Tables.events(s, d).withColumn("t", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("t").as("ct"))
      val converted = purchases.join(clicks,
        col("user_id") === col("cu")
          && col("ct") <= col("t") && col("ct") >= col("t") - 1800L * 1000000L,
        "left_semi")
      purchases.groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
        .join(converted.groupBy("user_id").agg(count(lit(1)).as("n_converted")),
          Seq("user_id"), "left")
        .na.fill(0L, Seq("n_converted"))
        .orderBy("user_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "ev_tumbling" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "ev_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  COUNT(*) AS n_events,
        |  MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS session_start,
        |  MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS session_end,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "ev_retention" ->
      """SELECT cohort_day, COUNT(*) AS n_users, CAST(SUM(n_events) AS BIGINT) AS n_events FROM (
        |  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS TIMESTAMP) AS cohort_day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY user_id) t
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,

    "ev_funnel" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |p AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t FROM ev WHERE event_type = 'click')
        |SELECT user_id, COUNT(*) AS n_purchases,
        |  COUNT(CASE WHEN EXISTS (SELECT 1 FROM c
        |    WHERE c.user_id = p.user_id AND c.t <= p.t AND c.t >= p.t - 1800000000) THEN 1 END) AS n_converted
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
