package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Events

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // day n at 12:00 (ns-truncation irrelevant at this resolution)
  private def ts(day: Int) = new Timestamp(86400000L * (19000 + day) + 43200000L)

  private def ev(rows: (Int, String, Double)*) =
    rows.zipWithIndex.map { case ((day, typ, v), i) => (i.toLong, ts(day), typ, v) }
      .toDF("event_id", "ts", "event_type", "value")

  test("dailyFilled emits every calendar day with zero-filled gaps") {
    val df = ev((0, "a", 1.0), (3, "a", 2.0), (1, "b", 5.0))
    val out = Events.dailyFilled(df).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n"))).toSet
    // type a spans 4 days (2 absent), type b spans 1
    assert(out.size == 5)
    assert(out.count { case (t, _, n) => t == "a" && n == 0L } == 2)
    assert(out.count { case (_, _, n) => n > 0L } == 3)
  }

  test("wma matches a directly computed linear-weighted average") {
    val df = ev((0, "a", 10.0), (1, "a", 20.0), (2, "a", 30.0))
    val out = SparkEntryTestHook.run(spark, df, "ev_wma")
    val wma = out.collect().map(r =>
      r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("wma")).toMap
    // day0: 10 (single obs, weight 30/30)
    // day1: (29*10 + 30*20) / 59
    // day2: (28*10 + 29*20 + 30*30) / 87
    assert(math.abs(wma.values.sum -
      (10.0 + (29 * 10.0 + 30 * 20.0) / 59 + (28 * 10.0 + 29 * 20.0 + 30 * 30.0) / 87)) < 1e-3)
  }

  test("ewma matches the closed-form truncated weighted average") {
    val df = ev((0, "a", 10.0), (1, "a", 20.0), (2, "a", 30.0))
    val out = SparkEntryTestHook.run(spark, df, "ev_ewma").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("ewma")).toMap
    // α=1/2 truncated-normalized weights double toward today: 1:2:4…
    val expected = Seq(10.0, (10.0 + 2 * 20.0) / 3, (10.0 + 2 * 20.0 + 4 * 30.0) / 7)
    assert(math.abs(out.values.sum - expected.sum) < 1e-4)
    assert(out.size == 3)
  }

  test("decompose: a purely weekly series is trend 40 + seasonal, residual exactly 0") {
    // 3 weeks of a period-7 pattern: every full centered window sums
    // one whole period → trend = 40 everywhere; the per-dow seasonal
    // absorbs the pattern exactly; residual = 0 — and
    // trend + seasonal reconstructs the observation
    val pat = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)
    val df = ev((0 until 21).map(d => (d, "a", pat(d % 7))): _*)
    val out = SparkEntryTestHook.run(spark, df, "ev_decompose").collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Double]("trend"),
        r.getAs[Double]("seasonal"), r.getAs[Double]("residual"))).sortBy(_._1)
    assert(out.size == 15) // full windows: days 3..17
    assert(out.forall(_._2 == 40.0))
    assert(out.forall(_._4 == 0.0))
    // reconstruct: trend + seasonal = the day's observation
    assert(out.zipWithIndex.forall { case ((_, t, s, _), i) =>
      t + s == pat((i + 3) % 7) })
  }

  test("holt: constant series forecasts itself exactly and emits warm rows only") {
    // 20 days of 5.0 — tap normalization makes the forecast EXACTLY 5;
    // only rows with a full 16-tap window (days 15..19) emit
    val df = ev((0 until 20).map(d => (d, "a", 5.0)): _*)
    val out = SparkEntryTestHook.run(spark, df, "ev_holt").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("holt_next")).toMap
    assert(out.size == 5)
    assert(out.values.forall(_ == 5.0))
  }

  test("holt: trend state extrapolates a linear ramp past the last observation") {
    // y_t = t for 18 days: the day-17 one-step forecast lands near
    // y_18 = 18 (hand-computed truncated-filter value 17.922005),
    // ABOVE the last observation — the lag EWMA can never clear
    val df = ev((0 until 18).map(d => (d, "a", d.toDouble)): _*)
    val out = SparkEntryTestHook.run(spark, df, "ev_holt").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("holt_next"))
      .sortBy(_._1)
    assert(out.size == 3) // days 15, 16, 17
    assert(math.abs(out.last._2 - 17.922005) < 1e-5)
    assert(out.last._2 > 17.0)
  }

  test("holt weights: exact integers, positive sum, leading tap 3·4^15") {
    val w = Events.holtWeights(16)
    assert(w.head == 3L * (1L << 30))
    assert(w.sum > 0L && w.exists(_ < 0L)) // complex eigenvalues ⇒ ringing taps
  }

  test("ewma zero-fills absent days so the window is calendar-true") {
    // day 0 then day 2 — the gap day enters the window with sv = 0, so
    // day 2's ewma is (1·10 + 2·0 + 4·30)/7, not (1·10 + 4·30)/5
    val df = ev((0, "a", 10.0), (2, "a", 30.0))
    val out = SparkEntryTestHook.run(spark, df, "ev_ewma").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Double]("ewma")).toMap
    assert(out.size == 3)
    assert(math.abs(out.values.max - (10.0 + 4 * 30.0) / 7) < 1e-4)
  }

  test("interArrival: bucket decomposition equals the naive global gap stats") {
    // type a: two within-day gaps plus a boundary gap bridging an
    // EMPTY calendar day; type b: single event → no gap row
    val base = 19000L * 86400000L
    def at(id: Long, offSec: Long, typ: String) =
      (id, new Timestamp(base + offSec * 1000L), typ, 1.0)
    val df = Seq(
      at(0L, 0L, "a"), at(1L, 60L, "a"), at(2L, 120L, "a"),
      at(3L, 2L * 86400L + 30L, "a"), // two midnights later
      at(4L, 500L, "b"))
      .toDF("event_id", "ts", "event_type", "value")
    val rows = SparkEntryTestHook.run(spark, df, "ev_interarrival").collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet == Set("a"))
    val r = rows.head
    val gaps = Seq(60e6.toLong, 60e6.toLong, (2L * 86400L - 120L + 30L) * 1000000L)
    assert(r.getAs[Long]("n_gaps") == 3L)
    assert(r.getAs[Long]("min_gap_us") == gaps.min)
    assert(r.getAs[Long]("max_gap_us") == gaps.max)
    val mean = gaps.sum.toDouble / 3
    assert(math.abs(r.getAs[Double]("avg_gap_sec") - mean / 1e6) < 1e-3)
    val sd = math.sqrt(gaps.map(g => g.toDouble * g).sum / 3 - mean * mean)
    assert(math.abs(r.getAs[Double]("sd_gap_sec") - sd / 1e6) < 1e-3)
  }

  test("growthAccounting: new/retained/resurrected/churned with a dead calendar day") {
    // user 10 active days 0,1,3; user 11 active day 0 only
    val base = 19000L * 86400000L
    def at(id: Long, day: Int, user: Long) =
      (id, new Timestamp(base + day * 86400000L + 43200000L), user, "a", 1.0)
    val df = Seq(at(0L, 0, 10L), at(1L, 1, 10L), at(2L, 3, 10L), at(3L, 0, 11L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Events.growthAccounting(
        df.withColumn("ts", col("ts")))
      .collect().sortBy(_.getAs[java.sql.Date]("day").toString)
      .map(r => (r.getAs[Long]("dau"), r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
    assert(out.length == 4) // grid covers the dead day 2
    assert(out(0) == ((2L, 2L, 0L, 0L, 0L)))          // day 0: both new
    assert(out(1) == ((1L, 0L, 1L, 0L, 1L)))          // day 1: u10 retained, u11 churned
    assert(out(2) == ((0L, 0L, 0L, 0L, 1L)))          // dead day: u10 churns
    assert(out(3) == ((1L, 0L, 0L, 1L, 0L)))          // day 3: u10 resurrected
  }

  test("conversionLag: latest in-window click wins; out-of-window clicks never pair") {
    val base = 19000L * 86400000L
    def at(id: Long, offSec: Long, user: Long, typ: String) =
      (id, new Timestamp(base + offSec * 1000L), user, typ, 1.0)
    val df = Seq(
      at(0L, 0L, 1L, "click"),         // 100 s before purchase
      at(1L, 70L, 1L, "click"),        // 30 s before — the LATEST click
      at(2L, 100L, 1L, "purchase"),
      at(3L, 0L, 2L, "click"),         // 10 days before user 2's purchase: outside window
      at(4L, 10L * 86400L, 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Events.conversionLag(df, 7L * 86400L).collect()
    assert(out.length == 1) // user 2's purchase has no in-window click
    val r = out.head
    assert(r.getAs[Long]("n_conversions") == 1L)
    assert(r.getAs[Double]("mean_lag_sec") == 30.0)
    assert(r.getAs[Double]("median_lag_sec") == 30.0)
  }

  test("userFeatures: fixed-vocabulary pivot with zero counts, span, error share") {
    val base = 19000L * 86400000L
    def at(id: Long, day: Int, user: Long, typ: String, v: Double) =
      (id, new Timestamp(base + day * 86400000L), user, typ, v)
    val df = Seq(
      at(0L, 0, 1L, "click", 1.5), at(1L, 0, 1L, "error", 0.0), at(2L, 2, 1L, "click", 2.5),
      at(3L, 5, 2L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Events.userFeatures(df, Seq("click", "view", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = out(1L)
    assert(u1.getAs[Long]("n_events") == 3L && u1.getAs[Long]("n_active_days") == 2L)
    assert(u1.getAs[Long]("span_days") == 2L)
    assert(u1.getAs[Long]("n_click") == 2L && u1.getAs[Long]("n_purchase") == 0L)
    assert(u1.getAs[Double]("sum_value") == 4.0)
    assert(math.abs(u1.getAs[Double]("error_share") - 1.0 / 3) < 1e-6)
    assert(out(2L).getAs[Long]("span_days") == 0L)
  }

  test("seasonalNaiveBacktest: week-over-week errors on a crafted series") {
    // type a: 2 events day 0, 1 event day 7 → one scored day, err −1
    val df = ev((0, "a", 1.0), (0, "a", 1.0), (7, "a", 1.0))
    val r = graft.operators.Events.seasonalNaiveBacktest(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_days") == 1L)
    assert(r.head.getAs[Double]("mae") == 1.0)
    assert(r.head.getAs[Double]("rmse") == 1.0)
    assert(r.head.getAs[Double]("mape") == 1.0)
  }

  test("anomaly flags a seeded spike and nothing else") {
    // 40 flat days then one 100× spike
    val flat = (0 until 40).map(d => (d, "a", 10.0))
    val df = ev((flat :+ ((40, "a", 1000.0))): _*)
    val out = SparkEntryTestHook.run(spark, df, "ev_anomaly").collect()
    assert(out.length == 1)
    assert(out.head.getAs[java.sql.Date]("day").toString.endsWith(
      Events.dailyFilled(df).agg(max("day")).head().getDate(0).toString.takeRight(2)))
    assert(out.head.getAs[Double]("sum_value") == 1000.0)
  }

  test("session_stats: histogram counts sessions by size with exact durations") {
    // user 1: a 3-event session (0s, 60s, 120s) then a fresh session
    // 2h later (single event); user 2: one 2-event session.
    val base = 19000L * 86400000L
    def at(userId: Long, offSec: Long, id: Long) =
      (id, new Timestamp(base + offSec * 1000L), userId, "a", 1.0)
    val df = Seq(
      at(1L, 0L, 0L), at(1L, 60L, 1L), at(1L, 120L, 2L),
      at(1L, 7320L, 3L),
      at(2L, 0L, 4L), at(2L, 100L, 5L)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-ss").toString
    df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.queries("ev_session_stats")(spark, dir).collect()
      .map(r => r.getAs[Long]("n_events") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Double]("avg_dur_sec"), r.getAs[Double]("share")))
      .toMap
    // sizes: one 3-event session (120s), one 1-event (0s), one 2-event (100s)
    assert(out(3L) == ((1L, 120.0, 0.333333)))
    assert(out(1L) == ((1L, 0.0, 0.333333)))
    assert(out(2L) == ((1L, 100.0, 0.333333)))
  }

  test("attribution: linear credit splits across touch days exactly") {
    val base = 19000L * 86400000L
    def at(typ: String, userId: Long, offSec: Long, id: Long) =
      (id, new Timestamp(base + offSec * 1000L), userId, typ, 1.0)
    // user 1: clicks on day 0 and day 1, purchase day 2 → each click
    // day earns 0.5; user 2: one click day 0, purchase day 0 → 1.0
    val df = Seq(
      at("click", 1L, 0L, 0L),
      at("click", 1L, 86400L, 1L),
      at("purchase", 1L, 2L * 86400L, 2L),
      at("click", 2L, 100L, 3L),
      at("purchase", 2L, 200L, 4L)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.queries("ev_attribution")(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("click_day").toLocalDate.toEpochDay - 19000L ->
        (r.getAs[Long]("n_touches"), r.getAs[Double]("credit"))).toMap
    assert(out(0L) == ((2L, 1.5))) // user 1's 0.5 + user 2's 1.0
    assert(out(1L) == ((1L, 0.5)))
  }

  test("concentration: exact gini from the distinct-count frame") {
    val base = 19000L * 86400000L
    def at(typ: String, userId: Long, id: Long) =
      (id, new Timestamp(base + id * 1000L), userId, typ, 1.0)
    // type a: user 1 → 1 event, user 2 → 3 events ⇒ gini = 0.25
    // type b: four users × 1 event ⇒ gini = 0 (perfect equality)
    val rows = Seq(at("a", 1L, 0L), at("a", 2L, 1L), at("a", 2L, 2L), at("a", 2L, 3L)) ++
      (10L to 13L).map(u => at("b", u, 10L + u))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-gini").toString
    df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.queries("ev_concentration")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("gini"))).toMap
    assert(out("a") == ((2L, 0.25)))
    assert(out("b") == ((4L, 0.0)))
  }

  test("active_users: WAU covers trailing 7 days without double-counting") {
    val base = 19000L * 86400000L
    def at(userId: Long, day: Long, id: Long) =
      (id, new Timestamp(base + day * 86400000L), userId, "a", 1.0)
    // user 1 active day 0 and day 3 (overlapping windows); user 2 day 0
    val df = Seq(at(1L, 0L, 0L), at(1L, 3L, 1L), at(2L, 0L, 2L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-au").toString
    df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.queries("ev_active_users")(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay - 19000L ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Double]("stickiness")))
      .toMap
    assert(out(0L) == ((2L, 2L, 1.0)))  // both users active
    // day 4: user 1's day-3 window + user 2's day-0 window, no activity
    assert(out(4L) == ((0L, 2L, 0.0)))
    // day 8: only user 1's day-3 window still covers
    assert(out(8L) == ((0L, 1L, 0.0)))
    // windows end: day 3+6=9 is the last covered day
    assert(!out.contains(10L) && out.contains(9L))
    // user 1 counted ONCE on days covered by both its activity days
    assert(out(3L) == ((1L, 2L, 0.5)))
  }

  test("burst: peak trailing-5-min count resolves to the earliest peak instant") {
    val base = 19000L * 86400000L
    def at(offSec: Long, id: Long) =
      (id, new Timestamp(base + offSec * 1000L), id, "a", 1.0)
    // burst of 3 events inside 5 min (0, 100, 200s), then two sparse
    // events far apart; a SECOND 3-burst later (2000, 2100, 2200s)
    // ties the peak — earliest instant must win.
    val df = Seq(at(0L, 0L), at(100L, 1L), at(200L, 2L),
      at(1000L, 3L), at(2000L, 4L), at(2100L, 5L), at(2200L, 6L))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-burst").toString
    df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.queries("ev_burst")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("peak_n") == 3L)
    // earliest instant achieving 3-in-5-min is the 200s event
    assert(out.head.getAs[Long]("peak_t") == (base + 200000L) * 1000L)
  }

  test("anomaly baseline excludes the current day (a spike cannot mask itself)") {
    // constant series: zero variance; any deviation must flag, constants must not
    val flat = (0 until 20).map(d => (d, "a", 10.0))
    val df = ev(flat: _*)
    assert(SparkEntryTestHook.run(spark, df, "ev_anomaly").count() == 0)
  }
}

/** Runs an Events query body against an in-memory events frame by
  * writing it to a temp dir in the Tables layout. */
object SparkEntryTestHook {
  def run(spark: org.apache.spark.sql.SparkSession,
      events: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    // Tables.events expects ns-long ts; write micros*1000 to match
    events.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .withColumn("props", lit("{}"))
      .withColumn("user_id", col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.operators.Events.queries(name)(spark, dir)
  }
}
