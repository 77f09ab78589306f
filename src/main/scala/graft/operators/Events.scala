package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** Gap-filled daily series per event_type: one row per (type, day)
    * for EVERY day between the type's first and last event — absent
    * days carry n=0 / sv=0, with the pre-fill sum kept nullable in
    * `sv_raw` for carry-forward fills. The grid generates from the
    * AGGREGATED daily frame (types × days rows, tiny), never from raw
    * events, so the fill costs one narrow generator + one equi-join on
    * (type, day) no matter how many raw events a day has. `sv` is an
    * exact DECIMAL so every downstream window sum is order-independent
    * (SURVEY §4 float discipline). */
  def dailyFilled(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(decV(col("value"))).as("sv_raw"))
    val grid = daily.groupBy("event_type")
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      // tight DECIMAL(14,4): wide-enough for any real daily sum, small
      // enough that sv·sv stays inside DECIMAL(38) EXACTLY on both
      // engines (a (28,4)² would hit Spark's precision cap and round)
      .withColumn("sv", coalesce(col("sv_raw"), lit(0)).cast(DecimalType(14, 4)))
  }

  /** Per-user event-type TRANSITION matrix (the first-order Markov
    * view of user journeys): for every consecutive event pair within a
    * user's (ts, event_id) order, count (from_type → to_type) and each
    * target's share of its source's outgoing transitions. One shuffle
    * on user_id for the lead window; the transition count is map-side
    * combinable; the share normalizes over the tiny |types|² frame. */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    trans.withColumn("share",
      round(col("n").cast(DoubleType)
        / sum(col("n")).over(Window.partitionBy("from_type")), 6))
  }

  /** Top-`k` most common opening user journeys: each user's first
    * `steps` event types in (ts, event_id) order joined into a path
    * string, counted across users — the product-analytics "common
    * paths" view next to [[transitions]]'s first-order matrix. One
    * row_number window (shuffle on user_id), then a map-side
    * combinable count over the tiny |distinct paths| frame; top-k via
    * count-then-path ordering so ties break deterministically. */
  def userPaths(events: DataFrame, steps: Int, k: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val paths = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= steps)
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** RFM (recency / frequency / monetary) user segmentation — the
    * lifecycle-analytics scoring table: per user, days since last
    * event (relative to the corpus's max day, so the score is
    * reproducible), event count, exact-decimal value sum, each mapped
    * to a 1–5 score, plus the composite cell (rank 555 = best).
    *
    * Scores are NOT a global NTILE over users (a single-partition sort
    * of every user — the exact shape q_window_running exists to
    * avoid). Instead score = floor(5·before/n)+1 where `before` =
    * users with a strictly WORSE value, computed as a window cumsum
    * over the BOUNDED distinct-value count frame: |days| values for
    * recency, |distinct counts| for frequency, and floor(mon/10)
    * buckets for monetary — all orders of magnitude smaller than the
    * user count, so the only global window runs over a frame that
    * fits one task at any corpus size. Ties share a score by
    * construction (no arbitrary NTILE tie splits), and every input to
    * the floor is an exact integer, so scores hash identically on any
    * engine. */
  def rfm(events: DataFrame): DataFrame = {
    val per = events.groupBy("user_id").agg(
      max(col("ts")).as("last_ts"),
      count(lit(1)).as("frequency"),
      sum(decV(col("value"))).as("mon"))
    val now = per.agg(max(to_date(col("last_ts"))).as("__now"),
      count(lit(1)).as("__n"))
    val base = per.crossJoin(broadcast(now))
      .select(col("user_id"),
        datediff(col("__now"), to_date(col("last_ts"))).cast(LongType).as("recency_days"),
        col("frequency"), col("mon"),
        floor(col("mon") / 10).cast(LongType).as("__mb"), col("__n"))
      .materialize() // feeds three score frames + the final join

    // score frame over the distinct values of one metric: before =
    // cumsum of user counts in worse-first order, strictly preceding
    def scores(key: String, worseIsHigher: Boolean, out: String): DataFrame = {
      val cnt = base.groupBy(col(key), col("__n")).agg(count(lit(1)).as("__c"))
      val w = Window
        .orderBy(if (worseIsHigher) col(key).desc else col(key).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      cnt.withColumn("__before", coalesce(sum("__c").over(w), lit(0L)))
        .select(col(key),
          (floor(col("__before") * 5 / col("__n")) + 1).cast(LongType).as(out))
    }
    base
      .join(broadcast(scores("recency_days", worseIsHigher = true, "r_score")), "recency_days")
      .join(broadcast(scores("frequency", worseIsHigher = false, "f_score")), "frequency")
      .join(broadcast(scores("__mb", worseIsHigher = false, "m_score")), "__mb")
      .select(col("user_id"), col("recency_days"), col("frequency"),
        round(col("mon").cast(DoubleType), 4).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_cell"))
  }

  /** Truncated exponential moving average of the daily value sum per
    * event type (α = 1/2, `lags`-day window) — the trend smoother next
    * to [[Events.queries]]' linear `ev_wma`. The recursive EWMA is
    * reformulated as its normalized truncated closed form
    * `Σ_{i=0..L-1} x_{t-i}·2^{L-1-i} / Σ 2^{L-1-i}` so the weights are
    * exact INTEGERS: numerator = decimal·long products summed exactly,
    * denominator = an integer sum, and the ONLY division is one double
    * at the output boundary — order-independent and engine-identical
    * (SURVEY §4 float discipline). Computed by a relative-index range
    * self-join over the gap-filled daily frame (|types|×|days| rows —
    * metadata-sized at any event volume), never over raw events; a
    * lag-indexed window would need position-dependent weights no plain
    * window sum expresses. */
  def ewmaDaily(events: DataFrame, lags: Int): DataFrame = {
    require(lags >= 1 && lags <= 62, s"2^lags must fit a LONG, got $lags")
    val byType = Window.partitionBy("event_type").orderBy("day")
    val daily = dailyFilled(events)
      .withColumn("rn", row_number().over(byType))
      .select(col("event_type"), col("day"), col("rn"), col("sv"))
    val cur = daily.select(col("event_type"), col("day"),
      col("rn").as("rn_t"))
    val past = daily.select(col("event_type"), col("rn").as("rn_j"), col("sv"))
    cur.join(past,
        cur("event_type") === past("event_type")
          && col("rn_j") <= col("rn_t")
          && col("rn_j") > col("rn_t") - lags)
      .drop(past("event_type"))
      // 2^k is a double-exact integer for k ≤ 62 (shiftleft's Scala
      // signature takes only a literal shift, so pow is the columnar form)
      .withColumn("w", pow(lit(2.0), lit(lags - 1) - (col("rn_t") - col("rn_j"))).cast(LongType))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("w") * col("sv")).cast(DoubleType)
          / sum(col("w")).cast(DoubleType), 6).as("ewma"))
  }

  /** Scaled integer forecast weights for the `lags`-tap truncated Holt
    * filter at α=β=1/2 (Holt 1957 / Hyndman-Athanasopoulos ch. 8.2).
    * The Holt recurrence is LINEAR — state [l,b]ᵗ = M·[l,b]ᵗ⁻¹ + v·yₜ
    * with M = [[1/2,1/2],[−1/4,3/4]], v = [1/2,1/4] — so the one-step
    * forecast l+b unrolls to a fixed convolution Σₖ wₖ·yₜ₋ₖ whose
    * taps decay like |eig(M)|ᵏ = 2^(−k/2); truncating at `lags` taps
    * turns a per-key SEQUENTIAL recurrence into the same parallel
    * lag-join shape as [[ewmaDaily]]. All taps are rationals with
    * denominator 4^(k+1), so scaling by 4^lags makes them exact
    * INTEGERS: wₖ = rowSum((4M)ᵏ·[2,1]) · 4^(lags−1−k), computed in
    * BigInt and ≤ 3·4^lags ≈ 1.3e10 at the 16-tap default — decimal
    * arithmetic end-to-end, one double division at the boundary,
    * cross-engine exact. Taps may go NEGATIVE (M has complex
    * eigenvalues — the trend term overshoots); the tap SUM stays
    * ≈ 4^lags positive. */
  def holtWeights(lags: Int): Seq[Long] = {
    require(lags >= 1 && lags <= 16,
      s"4^lags·3 must fit a LONG with decimal headroom, got $lags")
    var l = BigInt(2); var b = BigInt(1) // (4M)⁰ · 4v
    (0 until lags).map { k =>
      val w = (l + b) * BigInt(4).pow(lags - 1 - k)
      val (nl, nb) = (2 * l + 2 * b, 3 * b - l) // advance by 4M
      l = nl; b = nb
      w.toLong
    }
  }

  /** One-step-ahead Holt (double-exponential) forecast of the daily
    * value sum per type, as the [[holtWeights]] truncated convolution
    * normalized by the included-tap sum (the [[ewmaDaily]] treatment —
    * a constant series forecasts itself exactly). Emits only rows with
    * a full tap window (`rn ≥ lags`), so the truncation is the ONLY
    * approximation and both engines compute the identical filter. Same
    * scale shape as EWMA: the lag self-join is an equi-join on type
    * bounded to `lags` rows per output row, the tap lookup is a
    * codegen'd array literal (no join), and the aggregate is map-side
    * combinable decimal. */
  def holtDaily(events: DataFrame, lags: Int): DataFrame = {
    val wts = holtWeights(lags)
    val byType = Window.partitionBy("event_type").orderBy("day")
    val daily = dailyFilled(events)
      .withColumn("rn", row_number().over(byType))
      .select(col("event_type"), col("day"), col("rn"), col("sv"))
    val cur = daily.select(col("event_type"), col("day"), col("rn").as("rn_t"))
    val past = daily.select(col("event_type"), col("rn").as("rn_j"), col("sv"))
    val taps = array(wts.map(lit(_)): _*)
    cur.join(past,
        cur("event_type") === past("event_type")
          && col("rn_j") <= col("rn_t")
          && col("rn_j") > col("rn_t") - lags)
      .drop(past("event_type"))
      .filter(col("rn_t") >= lags)
      .withColumn("w", element_at(taps, (col("rn_t") - col("rn_j") + 1).cast("int")))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("w") * col("sv")).cast(DoubleType)
        / sum(col("w")).cast(DoubleType), 6).as("holt_next"))
  }

  /** Per-type inter-arrival statistics (count / min / max / mean / sd
    * of the gaps between consecutive events in global `(ts, event_id)`
    * order) WITHOUT a per-type global sort: a per-type ordered window
    * is one task per type at any scale — the exact shape
    * `q_window_running` exists to avoid. Instead gaps decompose by
    * calendar-day bucket: within-bucket gaps come from a window
    * partitioned by (type, day) — parallel across days — and the
    * |buckets| cross-day boundary gaps fold out of a lead over the
    * per-bucket (first_ts, last_ts) summary frame (days rows, one
    * task is fine). The union of the two gap sets is provably the
    * global gap multiset (every consecutive pair is either within one
    * day or bridges two adjacent present days; ties on ts contribute
    * zero gaps under any tie order). All moments accumulate as exact
    * integers/decimals — the double division and sqrt happen once at
    * the output boundary, so results hash identically cross-engine. */
  def interArrival(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("t"), to_date(col("ts")).as("day"))
    val inBucket = Window.partitionBy("event_type", "day")
      .orderBy(col("t"), col("event_id"))
    val within = ev
      .withColumn("gap", col("t") - lag(col("t"), 1).over(inBucket))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_w"), min(col("gap")).as("min_w"),
        max(col("gap")).as("max_w"), sum(col("gap")).as("sum_w"),
        // cast BEFORE the square: a long·long product of day-scale µs
        // gaps overflows silently; decimal(38)·long cannot
        sum(col("gap").cast(DecimalType(38, 0)) * col("gap")).as("ssq_w"))
    val summary = ev.groupBy("event_type", "day")
      .agg(min(col("t")).as("first_t"), max(col("t")).as("last_t"))
    val byType = Window.partitionBy("event_type").orderBy("day")
    val boundary = summary
      .withColumn("gap", lead(col("first_t"), 1).over(byType) - col("last_t"))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_b"), min(col("gap")).as("min_b"),
        max(col("gap")).as("max_b"), sum(col("gap")).as("sum_b"),
        sum(col("gap").cast(DecimalType(38, 0)) * col("gap")).as("ssq_b"))
    // full outer: a single-day type has no boundary gaps; a type whose
    // every day holds one event has no within gaps
    within.join(boundary, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n_w"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n_gaps"),
        least(col("min_w"), col("min_b")).as("min_gap_us"), // least/greatest skip nulls
        greatest(col("max_w"), col("max_b")).as("max_gap_us"),
        (coalesce(col("sum_w"), lit(0L)) + coalesce(col("sum_b"), lit(0L))).as("sum_us"),
        (coalesce(col("ssq_w"), lit(0).cast(DecimalType(38, 0)))
          + coalesce(col("ssq_b"), lit(0).cast(DecimalType(38, 0)))).as("ssq"))
      .filter(col("n_gaps") > 0)
      .select(col("event_type"), col("n_gaps"), col("min_gap_us"), col("max_gap_us"),
        round(col("sum_us").cast(DoubleType) / col("n_gaps") / 1e6, 4).as("avg_gap_sec"),
        round(sqrt(col("ssq").cast(DoubleType) / col("n_gaps")
          - (col("sum_us").cast(DoubleType) / col("n_gaps"))
            * (col("sum_us").cast(DoubleType) / col("n_gaps"))) / 1e6, 4).as("sd_gap_sec"))
  }

  /** Daily growth accounting — the new/retained/resurrected/churned
    * decomposition every product-analytics stack reports: each active
    * user-day classifies by the user's previous active day (first ever
    * → new; yesterday → retained; earlier → resurrected), and
    * churned(d) is the exact identity dau(d−1) − retained(d) — zero
    * extra passes, since retained(d) ⊆ present(d−1) by construction.
    * The calendar grid fills from the |days|-row daily frame so a
    * corpus-wide dead day still reports its churn. One distinct
    * shuffle on (user, day), one per-user lag window (parallel across
    * users), combinable counts; the only global window runs over the
    * |days| grid — metadata-sized at any event volume. */
  def growthAccounting(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val byUser = Window.partitionBy("user_id").orderBy("day")
    val daily = ud
      .withColumn("prev", lag(col("day"), 1).over(byUser))
      .withColumn("cls",
        when(col("prev").isNull, "new")
          .when(datediff(col("day"), col("prev")) === 1, "retained")
          .otherwise("resurrected"))
      .groupBy("day").agg(
        count(lit(1)).as("dau"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val grid = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val filled = grid.join(daily, Seq("day"), "left")
      .na.fill(0L, Seq("dau", "n_new", "n_retained", "n_resurrected"))
    val byDay = Window.orderBy("day") // |days| rows — metadata-sized
    filled.withColumn("n_churned",
      coalesce(lag(col("dau"), 1).over(byDay), lit(0L)) - col("n_retained"))
  }

  /** Seasonal-naive forecast BACKTEST per event type — the capacity-
    * planning sanity gate: predict each day's event count as the count
    * seven days earlier, score the week-2+ days, and report MAE / RMSE
    * / MAPE. Errors are INTEGER differences (exact sums, any order);
    * MAPE's per-day ratios round to 6 decimals THEN sum as exact
    * decimals (the emb_stats discipline — a double Σ of ratios would
    * be order-sensitive), with zero-actual days excluded from MAPE but
    * kept in MAE/RMSE. Runs entirely on the gap-filled |types|×|days|
    * daily frame. */
  def seasonalNaiveBacktest(events: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type").orderBy("day")
    dailyFilled(events)
      .withColumn("f", lag(col("n"), 7).over(byType))
      .filter(col("f").isNotNull)
      .withColumn("err", col("n") - col("f"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(sum(abs(col("err"))).cast(DoubleType) / count(lit(1)), 4).as("mae"),
        round(sqrt(sum(col("err") * col("err")).cast(DoubleType) / count(lit(1))), 4)
          .as("rmse"),
        round(sum(when(col("n") > 0,
            round(abs(col("err")).cast(DoubleType) / col("n"), 6).cast(DecimalType(18, 6))))
          .cast(DoubleType)
          / sum(when(col("n") > 0, 1L).otherwise(0L)), 6).as("mape"))
  }

  /** Per-user FEATURE ASSEMBLY — the feature-store materialization a
    * training pipeline runs over the event log (one wide row per
    * entity, ready to join onto a training set): per-type event
    * counts pivoted against a FIXED type vocabulary (never a dynamic
    * pivot — schema must be stable for the model contract, and a
    * two-pass distinct-discovery scan is wasted I/O at 100 TB),
    * activity breadth (distinct days), span, exact-decimal value sum,
    * and error share. ONE map-side-combinable aggregate keyed by
    * user — no windows, no joins; conditional counts compile to one
    * pass of the scan. */
  def userFeatures(events: DataFrame, types: Seq[String]): DataFrame = {
    val typeCounts = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      countDistinct(to_date(col("ts"))).as("n_active_days"),
      datediff(max(to_date(col("ts"))), min(to_date(col("ts")))).cast(LongType)
        .as("span_days"),
      round(sum(decV(col("value"))).cast(DoubleType), 4).as("sum_value")) ++
      typeCounts :+
      round(sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .cast(DoubleType) / count(lit(1)), 6).as("error_share")
    events.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Click→purchase CONVERSION LAG distribution per purchase day —
    * "how long does intent take to convert": each purchase pairs with
    * its LATEST click in the trailing `windowSec` (the equi-key carries
    * the shuffle, the time bound is a join filter — the ev_attribution
    * shape; the latest-click argmax is a plain max since every candidate
    * precedes the purchase), then per day: conversions, exact-integer
    * mean lag, and the exact interpolated median via the bounded-memory
    * quantile selection (never a per-day value buffer). */
  def conversionLag(events: DataFrame, windowSec: Long): DataFrame = {
    val ev = events.withColumn("t", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("t"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("t").as("ct"))
    val lags = purchases.join(clicks,
        col("user_id") === col("cu")
          && col("ct") <= col("t") && col("ct") >= col("t") - windowSec * 1000000L)
      .groupBy(col("pid"), col("t"))
      .agg(max(col("ct")).as("last_click"))
      .select(col("pid"),
        to_date(timestamp_micros(col("t"))).as("day"),
        (col("t") - col("last_click")).as("lag_us"))
      .materialize() // feeds the aggregate AND the quantile passes
    val stats = lags.groupBy("day").agg(
      count(lit(1)).as("n_conversions"),
      round(sum(col("lag_us")).cast(DoubleType) / count(lit(1)) / 1e6, 4)
        .as("mean_lag_sec"))
    val med = Percentiles.exactQuantiles(lags, "day", "lag_us", Seq("p50" -> 0.5))
      .select(col("day"), round(col("p50") / 1e6, 4).as("median_lag_sec"))
    stats.join(med, Seq("day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_conversion_lag" -> { (s, d) =>
      conversionLag(Tables.events(s, d), 7L * 86400L).orderBy("day")
    },

    "ev_features" -> { (s, d) =>
      userFeatures(Tables.events(s, d),
        Seq("click", "view", "purchase", "signup", "error")).orderBy("user_id")
    },

    "ev_growth" -> { (s, d) =>
      growthAccounting(Tables.events(s, d)).orderBy("day")
    },

    "ev_forecast" -> { (s, d) =>
      seasonalNaiveBacktest(Tables.events(s, d)).orderBy("event_type")
    },

    "ev_rfm" -> { (s, d) =>
      rfm(Tables.events(s, d)).orderBy("user_id")
    },

    "ev_ewma" -> { (s, d) =>
      // 20-lag α=1/2 truncated EWMA of the daily value sum — integer
      // weights, one boundary double division (engine-identical).
      ewmaDaily(Tables.events(s, d), 20).orderBy("event_type", "day")
    },

    "ev_rolling_median" -> { (s, d) =>
      // EXACT 7-day rolling MEDIAN of the daily value total per event
      // type — the robust-baseline smoother a monitoring pipeline
      // pairs with the EWMA (a median ignores the single-day spikes
      // ev_anomaly hunts). Exactness discipline: daily totals become
      // integer CENTS (decimal sum × 100), and the median is emitted
      // as 2×median (odd: twice the middle; even: the sum of the two
      // middles) so NO division ever happens — engine-identical
      // integers, no FP rounding seam. The window materializes ≤7
      // values per row (sort_array over collect_list — constant-sized
      // state, shuffle on event_type only).
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(col("value").cast("decimal(12,2)")) * 100)
          .cast("long").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      val lst = sort_array(collect_list(col("cents")).over(w))
      daily.withColumn("__l", lst)
        .select(col("event_type"), col("day"),
          when(size(col("__l")) % 2 === 1,
            element_at(col("__l"),
              ((size(col("__l")) + 1) / 2).cast("int")) * 2)
            .otherwise(element_at(col("__l"), (size(col("__l")) / 2).cast("int"))
              + element_at(col("__l"),
                (size(col("__l")) / 2).cast("int") + 1))
            .as("med2_cents"))
        .orderBy("event_type", "day")
    },

    "ev_decompose" -> { (s, d) =>
      // Classical additive decomposition (Hyndman–Athanasopoulos
      // ch. 3.4) of the daily series: trend = centered 7-day MA (full
      // windows only), weekly seasonal = per-dow mean of the
      // detrended series, residual = the rest — the view that
      // separates "volume is growing" from "it's just Monday" from
      // "something actually happened". All arithmetic stays
      // cross-multiplied decimal (detrended·7 = 7·sv − Σ₇sv is exact;
      // seasonal and residual carry the ·7·count denominators) so
      // every division is a single double rounding at the output
      // boundary. Windows + one dow aggregate over the gap-filled
      // daily frame — metadata-sized at any event volume.
      val w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
      val tr = dailyFilled(Tables.events(s, d))
        .withColumn("ts7", sum(col("sv")).over(w7))
        .withColumn("m7", count(lit(1)).over(w7))
        .filter(col("m7") === 7)
        .withColumn("dow", weekday(col("day")).cast(LongType))
        .withColumn("det7", col("sv") * 7 - col("ts7"))
      val seas = tr.groupBy("event_type", "dow")
        .agg(sum(col("det7")).as("sn"), count(lit(1)).as("sc"))
      tr.join(seas, Seq("event_type", "dow"))
        .select(col("event_type"), col("day"),
          round(col("ts7").cast(DoubleType) / 7, 4).as("trend"),
          round(col("sn").cast(DoubleType) / (col("sc") * 7), 4).as("seasonal"),
          round((col("det7") * col("sc") - col("sn")).cast(DoubleType)
            / (col("sc") * 7), 4).as("residual"))
        .orderBy("event_type", "day")
    },

    "ev_holt" -> { (s, d) =>
      // 16-tap truncated Holt one-step forecast — EWMA's trend-aware
      // sibling (a steadily growing series EWMA under-forecasts;
      // Holt's trend state extrapolates it).
      holtDaily(Tables.events(s, d), 16).orderBy("event_type", "day")
    },

    "ev_interarrival" -> { (s, d) =>
      interArrival(Tables.events(s, d)).orderBy("event_type")
    },

    "ev_attribution" -> { (s, d) =>
      // LINEAR multi-touch attribution by TOUCH DAY — "which days'
      // marketing touches drove conversions": each purchase splits one
      // unit of credit equally across the user's clicks in the
      // trailing 7 days (equi key carries the shuffle, the time window
      // is a join-condition filter — ev_funnel's range-join shape),
      // and each touch's share lands on its CLICK day. Credit sums are
      // EXACT scaled integers (round(1e6/n) per touch, long addition —
      // a double 1/n sum would be order-dependent and hash-unsafe),
      // one double division at the output boundary.
      val winUs = 7L * 86400L * 1000000L
      val ev = Tables.events(s, d).withColumn("t", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("t"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), to_date(col("ts")).as("click_day"),
          col("t").as("ct"))
      val touches = purchases.join(clicks,
          col("user_id") === col("cu")
            && col("ct") <= col("t") && col("ct") >= col("t") - winUs)
        .select(col("pid"), col("click_day"))
      val withN = touches
        .withColumn("n_touch", count(lit(1)).over(Window.partitionBy("pid")))
        .withColumn("credit_u", round(lit(1000000.0) / col("n_touch")).cast(LongType))
      withN.groupBy("click_day")
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("credit_u")).cast(DoubleType) / 1000000.0, 4).as("credit"))
        .orderBy("click_day")
    },

    "ev_concentration" -> { (s, d) =>
      // Activity-concentration audit per event type: the exact GINI
      // coefficient of the per-user event-count distribution — the
      // skew gauge that predicts whether user_id can key a shuffle
      // (gini → 1 means a few users own the traffic: salt or re-key).
      // NOT a global rank over users: with counts grouped to the
      // BOUNDED |distinct count values| frame (multiplicity m, users
      // below b), the sorted-rank identity Σᵢ i·cᵢ =
      // Σⱼ vⱼ·(mⱼ·bⱼ + mⱼ(mⱼ+1)/2) makes every term an exact integer
      // over a frame orders of magnitude smaller than the user count
      // (the ev_rfm device); one double expression at the boundary.
      val uc = Tables.events(s, d)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      val vm = uc.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("m"))
      val byType = Window.partitionBy("event_type").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
      vm.withColumn("b", coalesce(sum(col("m")).over(byType), lit(0L)))
        .groupBy("event_type")
        // integer `div` (never `/`, which is double division on longs);
        // per-term products fit a long, sums go through exact decimals
        // so the aggregate is order-independent past 2^53
        .agg(sum(col("m")).as("n_users"),
          sum((col("c") * col("m")).cast(DecimalType(28, 0))).as("__s"),
          sum((col("c") * (col("m") * col("b") + expr("m * (m + 1) div 2")))
            .cast(DecimalType(28, 0))).as("__t"))
        .select(col("event_type"), col("n_users"),
          round(lit(2.0) * col("__t").cast(DoubleType)
            / (col("n_users").cast(DoubleType) * col("__s").cast(DoubleType))
            - (col("n_users").cast(DoubleType) + lit(1.0)) / col("n_users").cast(DoubleType), 6)
            .as("gini"))
        .orderBy("event_type")
    },

    "ev_active_users" -> { (s, d) =>
      // DAU / trailing-7-day WAU / stickiness per day — the
      // engagement dashboard triple. WAU is a DISTINCT count over a
      // sliding window, which has no direct window-function form;
      // the exact linear-cost construction: dedupe to user-days, then
      // each user-day emits the days it ALONE covers in the trailing
      // window ([day, min(day+6, next_day−1)] — clipped so overlapping
      // activity never double-counts a (user, day) pair), making
      // WAU(d) a plain count. Shapes: one distinct shuffle, one lag
      // window per user, ≤7× narrow fan-out, two map-side-combinable
      // counts. No global sort, no distinct-over-window.
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val byUser = Window.partitionBy("user_id").orderBy("day")
      val covered = ud
        .withColumn("next_day", lead(col("day"), 1).over(byUser))
        .select(col("user_id"), explode(sequence(col("day"),
          least(date_add(col("day"), 6),
            coalesce(date_sub(col("next_day"), 1), date_add(col("day"), 6))))).as("d"))
      val wau = covered.groupBy("d").agg(count(lit(1)).as("wau"))
      val dau = ud.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau"))
      wau.join(dau, Seq("d"), "left")
        .na.fill(0L, Seq("dau"))
        .withColumn("stickiness", round(col("dau").cast(DoubleType) / col("wau"), 6))
        .orderBy("d")
    },

    "ev_session_stats" -> { (s, d) =>
      // Session-LENGTH distribution — the engagement profile next to
      // ev_sessionize's per-session rows: for each session size
      // (events per session), how many sessions, their mean duration,
      // and the size's share of all sessions. Durations are exact
      // epoch-µs BIGINT differences (order-independent sums); the
      // share window runs over the tiny |distinct sizes| frame.
      val sess = sessionize(Tables.events(s, d), 1800L)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
      sess.groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"),
          round(sum(col("dur_us")).cast(DoubleType) / count(lit(1)) / lit(1000000.0), 4)
            .as("avg_dur_sec"))
        .withColumn("share", round(col("n_sessions").cast(DoubleType)
          / sum(col("n_sessions")).over(Window.partitionBy()), 6))
        .orderBy("n_events")
    },

    "ev_burst" -> { (s, d) =>
      // Peak trailing-5-minute burst per event type — the rate-limit /
      // capacity-planning number ("what is the worst minute-scale
      // spike this type ever produced"). NOT one RANGE window per
      // type: |types| is tiny, so that window sorts the corpus on
      // ~|types|-way parallelism (measured 15 s at sf1 vs ~1 s for
      // this plan). Instead the textbook OVERLAP decomposition:
      // partition by (type, day), with each day's last 5 minutes
      // replicated into the NEXT day's partition as context-only rows
      // — they feed trailing counts across midnight but emit no row of
      // their own — so the per-partition window is EXACTLY the global
      // one, at day-level parallelism. Argmax resolves in the SAME
      // aggregate via a lexicographic struct max on (n_5m, −t) —
      // deterministically the EARLIEST peak instant, with no
      // join-back that would evaluate the window a second time.
      val winUs = 300L * 1000000L
      val dayUs = 86400L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("t"))
      val own = ev
        .withColumn("pday", expr(s"t div ${dayUs}L"))
        .withColumn("is_ctx", lit(false))
      val ctx = ev.filter(col("t") % dayUs >= dayUs - winUs)
        .withColumn("pday", expr(s"t div ${dayUs}L") + 1)
        .withColumn("is_ctx", lit(true))
      val win = Window.partitionBy("event_type", "pday").orderBy("t")
        .rangeBetween(-winUs, 0L)
      val withN = own.unionByName(ctx)
        .withColumn("n_5m", count(lit(1)).over(win))
        .filter(!col("is_ctx"))
      withN.groupBy(col("event_type"))
        .agg(max(struct(col("n_5m"), (-col("t")).as("neg_t"))).as("m"))
        .select(col("event_type"), col("m.n_5m").as("peak_n"),
          (-col("m.neg_t")).as("peak_t"))
        .orderBy("event_type")
    },

    "ev_user_path" -> { (s, d) =>
      // Top-20 5-step opening journeys (deterministic count-then-path
      // tiebreak so the LIMIT boundary hashes identically).
      userPaths(Tables.events(s, d), 5, 20)
    },

    "ev_seasonality" -> { (s, d) =>
      // Day-of-week seasonality profile per event type: count, exact-
      // decimal mean value, and the weekday's share of the type's
      // events. weekday() is 0=Monday — matched to DuckDB's isodow−1.
      // One map-side-combinable aggregate; shares normalize over the
      // tiny |types|×7 frame.
      val agg = Tables.events(s, d)
        .groupBy(col("event_type"), weekday(col("ts")).cast(LongType).as("dow"))
        .agg(count(lit(1)).as("n"),
          round(sum(decV(col("value"))).cast(DoubleType) / count(lit(1)), 4).as("avg_value"))
      agg.withColumn("share", round(col("n").cast(DoubleType)
          / sum(col("n")).over(Window.partitionBy("event_type")), 6))
        .orderBy("event_type", "dow")
    },

    "ev_cusum" -> { (s, d) =>
      // One-sided CUSUM changepoint score per type over the gap-filled
      // daily series — "when did ingest volume shift upward":
      // S_t = max(0, S_{t-1} + (x_t − target − slack)) has a closed
      // form S_t = P_t − min_{j≤t} P_j with P = running Σ(x − target −
      // slack), so the recursive reset becomes TWO plain running
      // windows (cumsum + running min) — no UDF, no iteration, exact
      // decimal math end-to-end; target = the type's global daily mean
      // (one tiny aggregate, broadcast back). Flag when S > threshold.
      // Division-free: target = mean would need a decimal division
      // (engine-rounded, hash-unsafe), so everything cross-multiplies
      // by the day count nn — P' = Σ(nn·x − ss − nn·slack) = nn·P is
      // exact integer/decimal algebra; the single double division
      // happens at the output boundary.
      val daily = dailyFilled(Tables.events(s, d))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nn"), sum(col("sv")).as("ss"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(tot), Seq("event_type"))
        .withColumn("pp", sum(col("nn") * col("sv") - col("ss") - col("nn") * lit(5)).over(w))
        .withColumn("sc", col("pp") - min(col("pp")).over(w))
        .select(col("event_type"), col("day"), col("n"),
          round(col("sc").cast(DoubleType) / col("nn"), 4).as("cusum"),
          (col("sc") > col("nn") * lit(50)).as("shifted"))
        .orderBy("event_type", "day")
    },

    "ev_transitions" -> { (s, d) =>
      transitions(Tables.events(s, d)).orderBy("from_type", "to_type")
    },

    "ev_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(decV(col("value"))).cast(DoubleType), 4).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type")
    },

    "ev_hopping" -> { (s, d) =>
      // HOPPING (sliding) window aggregate — the grouped twin of the
      // per-event RANGE frame in ev_sliding: 1-hour windows advancing
      // every 15 minutes, so each event lands in exactly 4 windows.
      // Spark's window() generator fans out 4 rows/event BEFORE the
      // map-side-combinable aggregate; the shuffle carries window
      // partials, never events. Streaming twin: StreamOps.hoppingCounts.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(decV(col("value"))).cast(DoubleType), 4).as("sum_value"))
        .select(unix_micros(col("w.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
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

    "ev_survival" -> { (s, d) =>
      // Kaplan–Meier LIFE TABLE of user lifetimes (Kaplan & Meier
      // 1958): lifetime = days between a user's first and last event;
      // users still active in the trailing 14 days of the corpus are
      // RIGHT-CENSORED (their true lifetime is only known to exceed
      // the observed one — dropping them would bias churn short, the
      // whole reason survival analysis exists). Output is the integer
      // life table (at_risk / deaths / censored per observed lifetime
      // day), SEGMENTED by event_type (each type defines its own
      // engagement lifetime — "how long do users keep purchasing" vs
      // "keep erroring" are different curves); the survival curve is
      // Π(1 − d/n) over these rows, left to the consumer so every
      // emitted number stays exact.
      // Shape: one per-(user, type) agg (the only corpus-sized
      // shuffle), then a lifetime-day rollup; the reverse-cumulative
      // at-risk window is PARTITIONED by event_type over ≤ span-days
      // rows per segment — metadata-sized at any event volume.
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      val mx = ev.agg(max(col("day")).as("mxd"))
      val lt = ev.groupBy("user_id", "event_type")
        .agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
        .crossJoin(broadcast(mx))
        .select(col("event_type"),
          datediff(col("ld"), col("fd")).cast(LongType).as("t"),
          (col("ld") > date_sub(col("mxd"), 14)).as("cens"))
      val byT = lt.groupBy("event_type", "t").agg(
        sum(when(col("cens"), 0L).otherwise(1L)).as("n_death"),
        sum(when(col("cens"), 1L).otherwise(0L)).as("n_censor"),
        count(lit(1)).as("leaving"))
      val w = Window.partitionBy("event_type").orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("at_risk", sum(col("leaving")).over(w))
        .select(col("event_type"), col("t"), col("at_risk"),
          col("n_death"), col("n_censor"))
        .orderBy("event_type", "t")
    },

    "ev_gapfill" -> { (s, d) =>
      // Daily series with calendar gaps made explicit: zero-filled
      // counts/sums plus last-observation-carried-forward of the daily
      // sum. The ffill window is one pass over the (tiny) filled grid.
      val byType = Window.partitionBy("event_type").orderBy("day")
      dailyFilled(Tables.events(s, d))
        .withColumn("sum_value", round(col("sv").cast(DoubleType), 4))
        .withColumn("ff_value",
          round(last(col("sv_raw"), ignoreNulls = true).over(byType).cast(DoubleType), 4))
        .select("event_type", "day", "n", "sum_value", "ff_value")
        .orderBy("event_type", "day")
    },

    "ev_wma" -> { (s, d) =>
      // 30-day linear-weighted moving average (weight 30 for today,
      // 29 yesterday, … 1): the position-dependent weight decomposes as
      // 30 − (d_t − d_j) = (30 − d_t) + d_j, so the weighted sum is two
      // PLAIN window sums over precomputed per-row terms (sv and d·sv)
      // — no per-row weight generation, no UDF, exact decimal math.
      // Gap-filled first, so window ROWS == calendar days.
      val win = Window.partitionBy("event_type").orderBy("d").rowsBetween(-29, 0)
      dailyFilled(Tables.events(s, d))
        .withColumn("d", datediff(col("day"), lit("1970-01-01")).cast(LongType))
        .withColumn("s1", sum(col("sv")).over(win))
        .withColumn("s2", sum(col("sv") * col("d")).over(win))
        .withColumn("m", count(lit(1)).over(win))
        // denominator: sum of weights 30, 29, … over the m window rows
        .withColumn("den", lit(30L) * col("m") - col("m") * (col("m") - 1) / 2)
        .withColumn("wma", round(
          ((lit(30L) - col("d")) * col("s1") + col("s2")).cast(DoubleType) / col("den"), 4))
        .select(col("event_type"), col("day"), col("n"),
          round(col("sv").cast(DoubleType), 4).as("sum_value"), col("wma"))
        .orderBy("event_type", "day")
    },

    "ev_funnel_steps" -> { (s, d) =>
      // ORDERED multi-step funnel (click → view → purchase, each step
      // within 7 days of the previous): each stage is one aggregate of
      // the stage's events joined to the PREVIOUS stage's one-row-per-
      // user frame on user_id (the equi key carries the shuffle; the
      // time window is a join-condition filter). Stages chain, so a
      // 5-step funnel is 5 joins — never a per-user event collect.
      val winUs = 7L * 86400L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      def firstAfter(evType: String, prev: DataFrame, prevT: String, outT: String) =
        ev.filter(col("event_type") === evType)
          .join(prev.select(col("user_id"), col(prevT)), Seq("user_id"))
          .filter(col("t") >= col(prevT) && col("t") <= col(prevT) + winUs)
          .groupBy("user_id").agg(min(col("t")).as(outT))
      val c = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("t")).as("t1"))
      val v = firstAfter("view", c, "t1", "t2")
      val p = firstAfter("purchase", v, "t2", "t3")
      def step(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("step"), col("n_users"))
      step("1_click", c).unionByName(step("2_view", v)).unionByName(step("3_purchase", p))
        .orderBy("step")
    },

    "ev_cohort_matrix" -> { (s, d) =>
      // Retention MATRIX (cohort day × days-since-first): how many of
      // each cohort's users were still active N days later — the
      // product-analytics triangle ev_retention's cohort sizes can't
      // answer. Two aggregates: first-seen per user (one shuffle on
      // user), then distinct users per (cohort, age) — the join is on
      // user_id against the tiny first-seen frame.
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstSeen = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(firstSeen, Seq("user_id"))
        .withColumn("age_days", datediff(col("day"), col("cohort_day")).cast(LongType))
        .groupBy("cohort_day", "age_days")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_day", "age_days")
    },

    "ev_sliding" -> { (s, d) =>
      // RANGE-frame window (vs the ROWS frames elsewhere): per event,
      // the count/sum of the SAME TYPE's events in the trailing hour of
      // EVENT TIME — frame membership decided by timestamp distance,
      // not row position, so bursts and quiet stretches see honest
      // trailing volumes. NOT one RANGE window per type: |types| is
      // tiny, so that window sorts the corpus at ~|types|-way
      // parallelism (the exact shape ev_burst measured at 15.5 s/sf1
      // and decomposed to 0.47 s). Same OVERLAP decomposition here:
      // partition by (event_type, day) with each day's trailing HOUR
      // replicated into the next day's partition as context-only rows
      // — they feed trailing counts/sums across midnight but emit no
      // row of their own — so the per-partition frame is EXACTLY the
      // global one, at day-level parallelism. Exact decimal sum keeps
      // the result order-independent, so the output hashes identically
      // to the single-partition plan.
      val winUs = 3600L * 1000000L
      val dayUs = 86400L * 1000000L
      val ev = Tables.events(s, d).withColumn("t", unix_micros(col("ts")))
      val own = ev
        .withColumn("pday", expr(s"t div ${dayUs}L"))
        .withColumn("is_ctx", lit(false))
      val ctx = ev.filter(col("t") % dayUs >= dayUs - winUs)
        .withColumn("pday", expr(s"t div ${dayUs}L") + 1)
        .withColumn("is_ctx", lit(true))
      val win = Window.partitionBy("event_type", "pday").orderBy("t")
        .rangeBetween(-winUs, 0L)
      own.unionByName(ctx)
        .withColumn("n_1h", count(lit(1)).over(win))
        .withColumn("sum_1h", round(sum(decV(col("value"))).over(win).cast(DoubleType), 4))
        .filter(!col("is_ctx"))
        .select("event_id", "event_type", "t", "n_1h", "sum_1h")
        .orderBy("event_id")
    },

    "ev_anomaly" -> { (s, d) =>
      // Ingest-volume anomaly days: daily sum vs the TRAILING 30-day
      // baseline (current day excluded — it must not drag its own
      // mean). Flag when (x − μ)² > (2.5σ)², cross-multiplied
      // division-free to (m·x − S)² > 6.25·(m·SS − S²) — 2.5σ is the
      // operating point that stays sensitive on short histories (a
      // 30-day series tops out near z≈2.7; 3σ would only ever fire on
      // long baselines). Baseline sums S/SS are exact
      // decimals (order-independent under any partitioning); the
      // comparison runs in double on identical inputs, so both engines
      // flag identical days (boundary ties are measure-zero). The
      // backup-domain read: "today's ingest is way off baseline —
      // hold the snapshot publish."
      val win = Window.partitionBy("event_type").orderBy("d").rowsBetween(-30, -1)
      dailyFilled(Tables.events(s, d))
        .withColumn("d", datediff(col("day"), lit("1970-01-01")).cast(LongType))
        .withColumn("s", sum(col("sv")).over(win))
        .withColumn("ss", sum(col("sv") * col("sv")).over(win))
        .withColumn("m", count(lit(1)).over(win))
        .withColumn("xd", col("sv").cast(DoubleType))
        .withColumn("lhs",
          (col("m").cast(DoubleType) * col("xd") - col("s").cast(DoubleType))
            * (col("m").cast(DoubleType) * col("xd") - col("s").cast(DoubleType)))
        .withColumn("rhs",
          lit(6.25) * (col("m").cast(DoubleType) * col("ss").cast(DoubleType)
            - col("s").cast(DoubleType) * col("s").cast(DoubleType)))
        .filter(col("m") >= 10 && col("lhs") > col("rhs"))
        .select(col("event_type"), col("day"),
          round(col("xd"), 4).as("sum_value"), col("m").as("n_baseline"))
        .orderBy("event_type", "day")
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
    },

    "ev_autocorr" -> { (s, d) =>
      // Lag-1..7 autocorrelation of each type's gap-filled daily count
      // series — the rhythm diagnostic behind ev_seasonality: a peak
      // at lag 7 means the weekly cycle dominates, fast decay means
      // volume is memoryless. All seven lags come from ONE window pass
      // of lead columns over the tiny (types × days) filled frame
      // (never raw events), posexploded to (lag, x, y) pairs; the
      // Pearson sufficient statistics are exact decimals (x·y widened
      // via DECIMAL(18,0) so the products never clip a long at any
      // scale factor), so the aggregate is order-independent, and the
      // closed form runs in double on integer-exact inputs both
      // engines convert identically.
      val d18 = DecimalType(18, 0)
      val byType = Window.partitionBy("event_type").orderBy("day")
      val base = dailyFilled(Tables.events(s, d))
        .select(col("event_type"), col("day"), col("n"))
      val withLeads = (1 to 7).foldLeft(base)((acc, k) =>
        acc.withColumn(s"y$k", lead(col("n"), k).over(byType)))
      val pairs = withLeads
        .select(col("event_type"), col("n").as("x"),
          posexplode(array((1 to 7).map(k => col(s"y$k")): _*)).as(Seq("k0", "y")))
        .filter(col("y").isNotNull)
        .select(col("event_type"), (col("k0") + 1).cast(LongType).as("lag"),
          col("x"), col("y"))
      val st = pairs.groupBy("event_type", "lag").agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x").cast(d18)).as("sx"), sum(col("y").cast(d18)).as("sy"),
        sum(col("x").cast(d18) * col("x").cast(d18)).as("sxx"),
        sum(col("y").cast(d18) * col("y").cast(d18)).as("syy"),
        sum(col("x").cast(d18) * col("y").cast(d18)).as("sxy"))
      val md = col("n_pairs").cast(DoubleType)
      def dd(c: String) = col(c).cast(DoubleType)
      st
        .withColumn("den",
          (md * dd("sxx") - dd("sx") * dd("sx"))
            * (md * dd("syy") - dd("sy") * dd("sy")))
        .select(col("event_type"), col("lag"), col("n_pairs"),
          when(col("den") <= 0, lit(null).cast(DoubleType))
            .otherwise(round(
              (md * dd("sxy") - dd("sx") * dd("sy")) / sqrt(col("den")), 6))
            .as("acf"))
        .orderBy("event_type", "lag")
    },

    "ev_anomaly_seasonal" -> { (s, d) =>
      // Same-WEEKDAY trailing-baseline anomaly days — ev_anomaly
      // conditioned on day-of-week, so a weekly-cyclic series doesn't
      // false-alarm every Monday against a mostly-weekend baseline
      // (and a quiet Sunday isn't masked by weekday volume): the
      // window partitions by (type, dow) and the trailing 4 SAME-dow
      // days form the baseline (a month of seasonal memory — sized to
      // the testdata's ~30-day span; at production spans widen the
      // frame) with the same flag rule. Identical exact-math discipline to
      // ev_anomaly: decimal S/SS, division-free cross-multiplied
      // (x−μ)² > (2.5σ)² comparison in double on identical inputs.
      val win = Window.partitionBy("event_type", "dow").orderBy("day")
        .rowsBetween(-4, -1)
      dailyFilled(Tables.events(s, d))
        .withColumn("dow", weekday(col("day")).cast(LongType))
        .withColumn("s", sum(col("sv")).over(win))
        .withColumn("ss", sum(col("sv") * col("sv")).over(win))
        .withColumn("m", count(lit(1)).over(win))
        .withColumn("xd", col("sv").cast(DoubleType))
        .withColumn("lhs",
          (col("m").cast(DoubleType) * col("xd") - col("s").cast(DoubleType))
            * (col("m").cast(DoubleType) * col("xd") - col("s").cast(DoubleType)))
        .withColumn("rhs",
          lit(6.25) * (col("m").cast(DoubleType) * col("ss").cast(DoubleType)
            - col("s").cast(DoubleType) * col("s").cast(DoubleType)))
        .filter(col("m") >= 3 && col("lhs") > col("rhs"))
        .select(col("event_type"), col("day"),
          round(col("xd"), 4).as("sum_value"), col("m").as("n_baseline"))
        .orderBy("event_type", "day")
    },

    "ev_heatmap" -> { (s, d) =>
      // Day-of-week × hour-of-day activity heat map per event type —
      // the load-profile view behind batch-window placement and
      // autoscaling schedules (ev_seasonality's dow profile, one
      // dimension finer). One map-side-combinable count over at most
      // |types|·7·24 cells; shares normalize in a window over that
      // metadata-sized frame, never a second event scan.
      val ev = Tables.events(s, d)
        .select(col("event_type"), weekday(col("ts")).cast(LongType).as("dow"),
          hour(col("ts")).cast(LongType).as("hod"))
      ev.groupBy("event_type", "dow", "hod").agg(count(lit(1)).as("n"))
        .withColumn("share", round(col("n").cast(DoubleType)
          / sum(col("n")).over(Window.partitionBy("event_type")), 6))
        .orderBy("event_type", "dow", "hod")
    },

    "ev_topk_movers" -> { (s, d) =>
      // Largest day-over-day volume swings across every type — the
      // ops "what changed yesterday" triage list. Deltas come from one
      // lag over the gap-filled frame (absent days are REAL zeros, so
      // a crash to silence ranks as hard as a spike); top-10 under a
      // TOTAL deterministic order (|delta| desc, type, day), and the
      // global sort runs on the tiny (types × days) frame, never raw
      // events.
      val byType = Window.partitionBy("event_type").orderBy("day")
      dailyFilled(Tables.events(s, d))
        .withColumn("prev_n", lag(col("n"), 1).over(byType))
        .filter(col("prev_n").isNotNull)
        .select(col("event_type"), col("day"), col("n"), col("prev_n"),
          (col("n") - col("prev_n")).as("delta"))
        .orderBy(abs(col("delta")).desc, col("event_type"), col("day"))
        .limit(10)
    }
  )

  /** Shared oracle CTE: the DuckDB mirror of [[dailyFilled]]. */
  private val oracleFilledCte =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS sv_raw
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1) b),
      |filled AS (
      |  SELECT g.event_type, g.day, COALESCE(n, 0) AS n,
      |    CAST(COALESCE(sv_raw, 0) AS DECIMAL(14,4)) AS sv, sv_raw
      |  FROM grid g LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ev_conversion_lag" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |p AS (SELECT event_id AS pid, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, t AS ct FROM ev WHERE event_type = 'click'),
        |lags AS (
        |  SELECT pid, t, MAX(ct) AS last_click
        |  FROM p JOIN c ON p.user_id = c.cu
        |    AND c.ct <= p.t AND c.ct >= p.t - 604800000000
        |  GROUP BY 1, 2),
        |l2 AS (
        |  SELECT pid, CAST(make_timestamp(t) AS DATE) AS day,
        |    t - last_click AS lag_us
        |  FROM lags)
        |SELECT day, COUNT(*) AS n_conversions,
        |  ROUND(CAST(SUM(lag_us) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS mean_lag_sec,
        |  ROUND(quantile_cont(lag_us, 0.5) / 1000000.0, 4) AS median_lag_sec
        |FROM l2 GROUP BY 1 ORDER BY day""".stripMargin,

    "ev_features" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS n_active_days,
        |  CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) AS BIGINT) AS span_days,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS error_share
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,

    "ev_growth" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |cl AS (
        |  SELECT user_id, day,
        |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
        |  FROM ud),
        |daily AS (
        |  SELECT day, COUNT(*) AS dau,
        |    SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS n_new,
        |    SUM(CASE WHEN date_diff('day', prev, day) = 1 THEN 1 ELSE 0 END) AS n_retained,
        |    SUM(CASE WHEN prev IS NOT NULL AND date_diff('day', prev, day) > 1 THEN 1 ELSE 0 END) AS n_resurrected
        |  FROM cl GROUP BY 1),
        |grid AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily) b),
        |filled AS (
        |  SELECT g.day AS day, COALESCE(dau, 0) AS dau, COALESCE(n_new, 0) AS n_new,
        |    COALESCE(n_retained, 0) AS n_retained,
        |    COALESCE(n_resurrected, 0) AS n_resurrected
        |  FROM grid g LEFT JOIN daily d ON g.day = d.day)
        |SELECT day, CAST(dau AS BIGINT) AS dau, CAST(n_new AS BIGINT) AS n_new,
        |  CAST(n_retained AS BIGINT) AS n_retained,
        |  CAST(n_resurrected AS BIGINT) AS n_resurrected,
        |  CAST(COALESCE(LAG(dau) OVER (ORDER BY day), 0) - n_retained AS BIGINT) AS n_churned
        |FROM filled ORDER BY day""".stripMargin,

    "ev_forecast" ->
      (oracleFilledCte +
        """,
          |f AS (
          |  SELECT event_type, day, n,
          |    LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
          |  FROM filled)
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
          |  ROUND(CAST(SUM(ABS(n - f)) AS DOUBLE) / COUNT(*), 4) AS mae,
          |  ROUND(sqrt(CAST(SUM((n - f) * (n - f)) AS DOUBLE) / COUNT(*)), 4) AS rmse,
          |  ROUND(CAST(SUM(CASE WHEN n > 0
          |      THEN CAST(ROUND(CAST(ABS(n - f) AS DOUBLE) / n, 6) AS DECIMAL(18,6)) END) AS DOUBLE)
          |    / SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END), 6) AS mape
          |FROM f WHERE f IS NOT NULL GROUP BY 1 ORDER BY event_type""".stripMargin),

    "ev_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, day,
        |    list_sort(list(cents) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
        |  FROM daily)
        |SELECT event_type, day,
        |  CASE WHEN len(l) % 2 = 1 THEN 2 * l[(len(l) + 1) // 2]
        |       ELSE l[len(l) // 2] + l[len(l) // 2 + 1] END AS med2_cents
        |FROM win ORDER BY event_type, day""".stripMargin,

    "ev_ewma" ->
      (oracleFilledCte +
        """,
          |idx AS (
          |  SELECT event_type, day, sv,
          |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM filled)
          |SELECT c.event_type AS event_type, c.day AS day,
          |  ROUND(CAST(SUM(CAST(power(2, 19 - (c.rn - p.rn)) AS BIGINT) * p.sv) AS DOUBLE)
          |    / CAST(SUM(CAST(power(2, 19 - (c.rn - p.rn)) AS BIGINT)) AS DOUBLE), 6) AS ewma
          |FROM idx c JOIN idx p ON p.event_type = c.event_type
          |  AND p.rn <= c.rn AND p.rn > c.rn - 20
          |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin),

    "ev_decompose" ->
      (oracleFilledCte +
        """,
          |t AS (
          |  SELECT event_type, day, sv,
          |    SUM(sv) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ts7,
          |    COUNT(*) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS m7,
          |    CAST(isodow(day) - 1 AS BIGINT) AS dow
          |  FROM filled),
          |f AS (SELECT *, sv * 7 - ts7 AS det7 FROM t WHERE m7 = 7),
          |seas AS (SELECT event_type, dow, SUM(det7) AS sn, COUNT(*) AS sc
          |  FROM f GROUP BY 1, 2)
          |SELECT f.event_type AS event_type, f.day AS day,
          |  ROUND(CAST(ts7 AS DOUBLE) / 7, 4) AS trend,
          |  ROUND(CAST(sn AS DOUBLE) / (sc * 7), 4) AS seasonal,
          |  ROUND(CAST(det7 * sc - sn AS DOUBLE) / (sc * 7), 4) AS residual
          |FROM f JOIN seas USING (event_type, dow)
          |ORDER BY 1, 2""".stripMargin),

    "ev_holt" ->
      (oracleFilledCte +
        s""",
          |idx AS (
          |  SELECT event_type, day, sv,
          |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM filled),
          |w(lag, wt) AS (VALUES ${holtWeights(16).zipWithIndex
            .map { case (wt, k) => s"($k, CAST($wt AS BIGINT))" }.mkString(", ")})
          |SELECT c.event_type AS event_type, c.day AS day,
          |  ROUND(CAST(SUM(w.wt * p.sv) AS DOUBLE)
          |    / CAST(SUM(w.wt) AS DOUBLE), 6) AS holt_next
          |FROM idx c JOIN idx p ON p.event_type = c.event_type
          |  AND p.rn <= c.rn AND p.rn > c.rn - 16
          |JOIN w ON w.lag = c.rn - p.rn
          |WHERE c.rn >= 16
          |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin),

    "ev_interarrival" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |lagged AS (
        |  SELECT event_type,
        |    t - LAG(t) OVER (PARTITION BY event_type ORDER BY t, event_id) AS gap
        |  FROM ev),
        |g AS (SELECT event_type, gap FROM lagged WHERE gap IS NOT NULL)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
        |  ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS avg_gap_sec,
        |  ROUND(sqrt(CAST(SUM(CAST(gap AS HUGEINT) * gap) AS DOUBLE) / COUNT(*)
        |    - (CAST(SUM(gap) AS DOUBLE) / COUNT(*))
        |      * (CAST(SUM(gap) AS DOUBLE) / COUNT(*))) / 1000000.0, 4) AS sd_gap_sec
        |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin,

    "ev_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |p AS (SELECT event_id AS pid, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, CAST(date_trunc('day', ts) AS DATE) AS click_day,
        |  t AS ct FROM ev WHERE event_type = 'click'),
        |touches AS (
        |  SELECT pid, click_day FROM p JOIN c ON p.user_id = c.cu
        |    AND c.ct <= p.t AND c.ct >= p.t - 604800000000),
        |w AS (
        |  SELECT click_day,
        |    CAST(ROUND(1000000.0 / COUNT(*) OVER (PARTITION BY pid)) AS BIGINT) AS credit_u
        |  FROM touches)
        |SELECT click_day, COUNT(*) AS n_touches,
        |  ROUND(CAST(SUM(credit_u) AS DOUBLE) / 1000000.0, 4) AS credit
        |FROM w GROUP BY 1 ORDER BY click_day""".stripMargin,

    "ev_concentration" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, COUNT(*) AS c FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, c, ROW_NUMBER() OVER (
        |    PARTITION BY event_type ORDER BY c, user_id) AS i
        |  FROM uc)
        |SELECT event_type, COUNT(*) AS n_users,
        |  ROUND(2.0 * CAST(SUM(i * c) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
        |    - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,

    "ev_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |lagged AS (
        |  SELECT user_id, day,
        |    LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
        |  FROM ud),
        |cov AS (
        |  SELECT user_id, CAST(unnest(generate_series(day,
        |    LEAST(day + INTERVAL 6 DAY,
        |      COALESCE(next_day - INTERVAL 1 DAY, day + INTERVAL 6 DAY)),
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM lagged),
        |wau AS (SELECT d, COUNT(*) AS wau FROM cov GROUP BY 1),
        |dau AS (SELECT day AS d, COUNT(*) AS dau FROM ud GROUP BY 1)
        |SELECT wau.d, COALESCE(dau, 0) AS dau, wau,
        |  ROUND(CAST(COALESCE(dau, 0) AS DOUBLE) / wau, 6) AS stickiness
        |FROM wau LEFT JOIN dau ON wau.d = dau.d
        |ORDER BY wau.d""".stripMargin,

    "ev_session_stats" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged),
        |per AS (
        |  SELECT user_id, session_seq, COUNT(*) AS n_events,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP))) - MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS dur_us
        |  FROM sessions GROUP BY 1, 2)
        |SELECT n_events, COUNT(*) AS n_sessions,
        |  ROUND(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS avg_dur_sec,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share
        |FROM per GROUP BY n_events ORDER BY n_events""".stripMargin,

    "ev_burst" ->
      """WITH w AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |      RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS n_5m
        |  FROM events),
        |p AS (SELECT event_type, MAX(n_5m) AS peak_n FROM w GROUP BY 1)
        |SELECT w.event_type AS event_type, peak_n, MIN(t) AS peak_t
        |FROM w JOIN p ON w.event_type = p.event_type AND w.n_5m = p.peak_n
        |GROUP BY 1, 2 ORDER BY w.event_type""".stripMargin,

    "ev_rfm" ->
      """WITH per AS (
        |  SELECT user_id, max(ts) AS last_ts, COUNT(*) AS frequency,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS mon
        |  FROM events GROUP BY 1),
        |now_n AS (SELECT max(CAST(last_ts AS DATE)) AS nd, COUNT(*) AS n FROM per),
        |base AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(last_ts AS DATE), nd) AS recency_days,
        |    frequency, mon, CAST(FLOOR(mon / 10) AS BIGINT) AS mb, n
        |  FROM per CROSS JOIN now_n),
        |rc AS (SELECT recency_days, n, COUNT(*) AS c FROM base GROUP BY 1, 2),
        |rs AS (SELECT recency_days,
        |  CAST(FLOOR(COALESCE(SUM(c) OVER (ORDER BY recency_days DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5.0 / n) + 1 AS BIGINT) AS r_score
        |  FROM rc),
        |fc AS (SELECT frequency, n, COUNT(*) AS c FROM base GROUP BY 1, 2),
        |fs AS (SELECT frequency,
        |  CAST(FLOOR(COALESCE(SUM(c) OVER (ORDER BY frequency ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5.0 / n) + 1 AS BIGINT) AS f_score
        |  FROM fc),
        |mc AS (SELECT mb, n, COUNT(*) AS c FROM base GROUP BY 1, 2),
        |ms AS (SELECT mb,
        |  CAST(FLOOR(COALESCE(SUM(c) OVER (ORDER BY mb ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5.0 / n) + 1 AS BIGINT) AS m_score
        |  FROM mc)
        |SELECT b.user_id, b.recency_days, CAST(b.frequency AS BIGINT) AS frequency,
        |  ROUND(CAST(b.mon AS DOUBLE), 4) AS monetary,
        |  r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS rfm_cell
        |FROM base b
        |  JOIN rs USING (recency_days)
        |  JOIN fs USING (frequency)
        |  JOIN ms USING (mb)
        |ORDER BY b.user_id""".stripMargin,

    "ev_user_path" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "ev_cusum" ->
      s"""$oracleFilledCte,
        |tot AS (SELECT event_type, COUNT(*) AS nn, SUM(sv) AS ss FROM filled GROUP BY 1),
        |p AS (
        |  SELECT f.event_type, f.day, f.n,
        |    SUM(nn * sv - ss - nn * 5) OVER (PARTITION BY f.event_type ORDER BY f.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp, nn
        |  FROM filled f JOIN tot USING (event_type)),
        |s AS (
        |  SELECT event_type, day, n, nn,
        |    pp - MIN(pp) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc
        |  FROM p)
        |SELECT event_type, day, n,
        |  ROUND(CAST(sc AS DOUBLE) / nn, 4) AS cusum,
        |  sc > nn * 50 AS shifted
        |FROM s ORDER BY event_type, day""".stripMargin,

    "ev_seasonality" ->
      """WITH agg AS (
        |  SELECT event_type, CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS BIGINT) AS dow,
        |    COUNT(*) AS n,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, n, avg_value,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6) AS share
        |FROM agg ORDER BY event_type, dow""".stripMargin,

    "ev_transitions" ->
      """WITH trans AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |counts AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM trans WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS share
        |FROM counts ORDER BY from_type, to_type""".stripMargin,

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

    "ev_survival" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
        |mx AS (SELECT MAX(day) AS mxd FROM ev),
        |lt AS (
        |  SELECT event_type, date_diff('day', MIN(day), MAX(day)) AS t,
        |    (MAX(day) > mxd - INTERVAL 14 DAY) AS cens
        |  FROM ev CROSS JOIN mx GROUP BY user_id, event_type, mxd),
        |byt AS (
        |  SELECT event_type, t,
        |    CAST(SUM(CASE WHEN cens THEN 0 ELSE 1 END) AS BIGINT) AS n_death,
        |    CAST(SUM(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT) AS n_censor,
        |    COUNT(*) AS leaving
        |  FROM lt GROUP BY 1, 2)
        |SELECT event_type, t,
        |  CAST(SUM(leaving) OVER (PARTITION BY event_type ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk,
        |  n_death, n_censor
        |FROM byt ORDER BY event_type, t""".stripMargin,

    "ev_gapfill" ->
      s"""$oracleFilledCte
        |SELECT event_type, day, n,
        |  ROUND(CAST(sv AS DOUBLE), 4) AS sum_value,
        |  ROUND(CAST(LAST_VALUE(sv_raw IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY day) AS DOUBLE), 4) AS ff_value
        |FROM filled ORDER BY event_type, day""".stripMargin,

    "ev_wma" ->
      s"""$oracleFilledCte,
        |w AS (
        |  SELECT event_type, day, n, sv,
        |    date_diff('day', DATE '1970-01-01', day) AS d,
        |    SUM(sv) OVER win AS s1,
        |    SUM(sv * date_diff('day', DATE '1970-01-01', day)) OVER win AS s2,
        |    COUNT(*) OVER win AS m
        |  FROM filled
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, n, ROUND(CAST(sv AS DOUBLE), 4) AS sum_value,
        |  ROUND(CAST((30 - d) * s1 + s2 AS DOUBLE) / (30 * m - m * (m - 1) / 2), 4) AS wma
        |FROM w ORDER BY event_type, day""".stripMargin,

    "ev_funnel_steps" ->
      """WITH c AS (
        |  SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |v AS (
        |  SELECT e.user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t2
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |    AND epoch_us(CAST(ts AS TIMESTAMP)) BETWEEN c.t1 AND c.t1 + 604800000000
        |  WHERE event_type = 'view' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t3
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |    AND epoch_us(CAST(ts AS TIMESTAMP)) BETWEEN v.t2 AND v.t2 + 604800000000
        |  WHERE event_type = 'purchase' GROUP BY e.user_id)
        |SELECT '1_click' AS step, (SELECT COUNT(*) FROM c) AS n_users
        |UNION ALL SELECT '2_view', (SELECT COUNT(*) FROM v)
        |UNION ALL SELECT '3_purchase', (SELECT COUNT(*) FROM p)
        |ORDER BY step""".stripMargin,

    "ev_cohort_matrix" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |fs AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS BIGINT) AS age_days,
        |  COUNT(DISTINCT ev.user_id) AS n_active
        |FROM ev JOIN fs ON ev.user_id = fs.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_hopping" ->
      """WITH ev AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type, value FROM events),
        |w AS (
        |  SELECT (CAST(FLOOR(t / 900000000) AS BIGINT) - k) * 900000000 AS w_start,
        |    event_type, value
        |  FROM ev, UNNEST([0, 1, 2, 3]) AS u(k))
        |SELECT w_start, event_type, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "ev_sliding" ->
      """SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |  COUNT(*) OVER win AS n_1h,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER win AS DOUBLE), 4) AS sum_1h
        |FROM events
        |WINDOW win AS (PARTITION BY event_type ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "ev_anomaly" ->
      s"""$oracleFilledCte,
        |w AS (
        |  SELECT event_type, day, sv,
        |    SUM(sv) OVER win AS s,
        |    SUM(sv * sv) OVER win AS ss,
        |    COUNT(*) OVER win AS m
        |  FROM filled
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, ROUND(CAST(sv AS DOUBLE), 4) AS sum_value, m AS n_baseline
        |FROM w
        |WHERE m >= 10
        |  AND (m * CAST(sv AS DOUBLE) - CAST(s AS DOUBLE))
        |    * (m * CAST(sv AS DOUBLE) - CAST(s AS DOUBLE))
        |    > 6.25 * (m * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |ORDER BY event_type, day""".stripMargin,

    "ev_funnel" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |p AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t FROM ev WHERE event_type = 'click')
        |SELECT user_id, COUNT(*) AS n_purchases,
        |  COUNT(CASE WHEN EXISTS (SELECT 1 FROM c
        |    WHERE c.user_id = p.user_id AND c.t <= p.t AND c.t >= p.t - 1800000000) THEN 1 END) AS n_converted
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ev_autocorr" ->
      s"""$oracleFilledCte,
        |p AS (
        |  SELECT a.event_type, CAST(date_diff('day', a.day, b.day) AS BIGINT) AS lag,
        |    a.n AS x, b.n AS y
        |  FROM filled a JOIN filled b
        |    ON a.event_type = b.event_type
        |   AND b.day > a.day AND b.day <= a.day + INTERVAL 7 DAY),
        |st AS (
        |  SELECT event_type, lag, COUNT(*) AS n_pairs,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM p GROUP BY 1, 2)
        |SELECT event_type, lag, n_pairs,
        |  CASE WHEN (n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
        |    THEN NULL
        |    ELSE ROUND(
        |      (n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / SQRT((n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           * (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS acf
        |FROM st ORDER BY event_type, lag""".stripMargin,

    "ev_anomaly_seasonal" ->
      (oracleFilledCte +
        """,
        |w AS (
        |  SELECT event_type, day, sv,
        |    SUM(sv) OVER win AS s, SUM(sv * sv) OVER win AS ss,
        |    COUNT(*) OVER win AS m
        |  FROM (SELECT event_type, day, sv,
        |          isodow(CAST(day AS TIMESTAMP)) - 1 AS dow FROM filled)
        |  WINDOW win AS (PARTITION BY event_type, dow ORDER BY day
        |    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, ROUND(CAST(sv AS DOUBLE), 4) AS sum_value, m AS n_baseline
        |FROM w
        |WHERE m >= 3
        |  AND (m * CAST(sv AS DOUBLE) - CAST(s AS DOUBLE))
        |    * (m * CAST(sv AS DOUBLE) - CAST(s AS DOUBLE))
        |    > 6.25 * (m * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |ORDER BY event_type, day""".stripMargin),

    "ev_heatmap" ->
      """WITH c AS (
        |  SELECT event_type, isodow(CAST(ts AS TIMESTAMP)) - 1 AS dow,
        |    hour(CAST(ts AS TIMESTAMP)) AS hod, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |  CAST(hod AS BIGINT) AS hod, n,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6)
        |    AS share
        |FROM c ORDER BY event_type, dow, hod""".stripMargin,

    "ev_topk_movers" ->
      s"""$oracleFilledCte,
        |l AS (
        |  SELECT event_type, day, n,
        |    LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
        |  FROM filled)
        |SELECT event_type, day, n, prev_n, n - prev_n AS delta
        |FROM l WHERE prev_n IS NOT NULL
        |ORDER BY ABS(n - prev_n) DESC, event_type, day LIMIT 10""".stripMargin
  )
}
