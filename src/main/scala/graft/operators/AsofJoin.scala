package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (SURVEY §2: custom operators).
  *
  * For each left row, attach the latest right row of the same key
  * whose time is <= the left row's time (inclusive).
  *
  * Implemented as union + running `last(_, ignoreNulls)` over a
  * (key, time)-ordered window, NOT as an inequality join + rank:
  * the inequality-join formulation produces O(|L|·|R|) intermediate
  * rows per key before pruning, while this shape is one shuffle on the
  * key and a single linear pass per partition — the same cost as a
  * sort-merge join, at any scale. Right rows sort before left rows at
  * equal timestamps, giving the standard inclusive (>=) ASOF
  * semantics.
  */
object AsofJoin {

  /** @param left       probe side
    * @param right      reference side (its latest-at-or-before row is attached)
    * @param key        equi-join key column name (present on both sides)
    * @param leftTime   left ordering column (any orderable type)
    * @param rightTime  right ordering column (same type as leftTime)
    * @param rightCols  right columns to attach (null when no match yet)
    * @param tolerance  when set: a match further than this from the
    *                   left time (|leftTime − rightTime| > tolerance)
    *                   is nulled out — the pandas `merge_asof`
    *                   tolerance. Must be a literal of the time
    *                   column's difference type.
    * @param forward    false (default) = latest right at-or-BEFORE the
    *                   left time (inclusive `<=`); true = earliest
    *                   right at-or-AFTER it (inclusive `>=`) — the
    *                   same single-shuffle running-pass shape, with
    *                   the window order reversed.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               tolerance: Option[Column] = None,
               forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // carry the right time inside the payload so tolerance can be
    // checked after the running pass (a stale match nulls out)
    val rStruct = struct((col(rightTime).as("__rt") +: rightCols.map(col)): _*)
    val rPayType = right.select(rStruct).schema.head.dataType
    val lPrepped = left.select(
      (leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")
        :+ lit(null).cast(rPayType).as("__rpay")): _*)
    val rPrepped = right.select(
      (leftCols.map(c =>
        (if (c == key) col(key) else lit(null).cast(left.schema(c).dataType)).as(c))
        :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+ rStruct.as("__rpay")): _*)
    val unioned = lPrepped.unionByName(rPrepped)
    // backward: right rows sort BEFORE left rows at equal times and the
    // running last() looks back — inclusive <=. forward: descending
    // time, so the running last() sees the earliest at-or-after row.
    val w = (if (forward)
        Window.partitionBy(key).orderBy(col("__t").desc, col("__side"))
      else
        Window.partitionBy(key).orderBy(col("__t"), col("__side")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = tolerance match {
      case None => matched.withColumn("__ok", col("__match").isNotNull)
      case Some(tol) =>
        val dist = if (forward) col("__match.__rt") - col("__t")
                   else col("__t") - col("__match.__rt")
        matched.withColumn("__ok", col("__match").isNotNull && dist <= tol)
    }
    inTol.select((leftCols.map(col) ++ rightCols.map(c =>
      when(col("__ok"), col(s"__match.$c")).as(s"asof_$c"))): _*)
  }

  /** direction = "nearest" (pandas merge_asof's third mode): attach
    * the right row minimizing |leftTime − rightTime|, ties → the
    * backward (at-or-before) match. Same union frame as [[asofJoin]]
    * with BOTH running passes — ascending for the backward candidate,
    * descending for the forward one — sharing a single hash partition
    * on the key (one Exchange, two sorts); the winner is a narrow
    * projection. Never an inequality join. `tolerance` bounds the
    * CHOSEN match's distance. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStruct = struct((col(rightTime).as("__rt") +: rightCols.map(col)): _*)
    val rPayType = right.select(rStruct).schema.head.dataType
    val lPrepped = left.select(
      (leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")
        :+ lit(null).cast(rPayType).as("__rpay")): _*)
    val rPrepped = right.select(
      (leftCols.map(c =>
        (if (c == key) col(key) else lit(null).cast(left.schema(c).dataType)).as(c))
        :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+ rStruct.as("__rpay")): _*)
    val unioned = lPrepped.unionByName(rPrepped)
    val wB = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key).orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__mb", last(col("__rpay"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__rpay"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val distB = col("__t") - col("__mb.__rt")
    val distF = col("__mf.__rt") - col("__t")
    val pickB = col("__mb").isNotNull &&
      (col("__mf").isNull || distB <= distF) // tie → backward
    val chosen = matched.withColumn("__match",
      when(pickB, col("__mb")).otherwise(col("__mf")))
    val inTol = tolerance match {
      case None => chosen.withColumn("__ok", col("__match").isNotNull)
      case Some(tol) =>
        val dist = when(pickB, distB).otherwise(distF)
        chosen.withColumn("__ok", col("__match").isNotNull && dist <= tol)
    }
    inTol.select((leftCols.map(col) ++ rightCols.map(c =>
      when(col("__ok"), col(s"__match.$c")).as(s"asof_$c"))): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_nearest" -> { (s, d) =>
      // For each purchase: the user's click NEAREST in time, either
      // direction, within 30 minutes; equidistant → the earlier click.
      // Oracle: DuckDB ASOF joins from both directions + the same
      // CASE pick.
      val ev = Tables.events(s, d).withColumn("t", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("t").as("click_t"))
        .agg(max(col("event_id")).as("click_id"))
      asofJoinNearest(purchases, clicks, "user_id", "t", "click_t",
        Seq("click_id", "click_t"), tolerance = Some(lit(1800L * 1000000L)))
        .select(col("event_id"), col("user_id"), col("t"),
          col("asof_click_id").as("click_id"), col("asof_click_t").as("click_t"))
        .orderBy("user_id", "t", "event_id")
    },

    "asof_join" -> { (s, d) =>
      // For each purchase event: the user's latest click at-or-before it.
      // Clicks are pre-deduped to one row per (user, µs-timestamp) —
      // keeping max event_id — in BOTH engines: with ties on the right
      // side, neither Spark's running-last nor DuckDB's ASOF JOIN
      // defines which row wins, so the match would be nondeterministic.
      val ev = Tables.events(s, d).withColumn("t", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("t").as("click_t"))
        .agg(max(col("event_id")).as("click_id"))
      asofJoin(purchases, clicks, "user_id", "t", "click_t", Seq("click_id", "click_t"))
        .select(col("event_id"), col("user_id"), col("t"),
          col("asof_click_id").as("click_id"), col("asof_click_t").as("click_t"))
        .orderBy("user_id", "t", "event_id")
    },

    "asof_forward_tol" -> { (s, d) =>
      // Attribution window: for each click, the user's EARLIEST
      // purchase at-or-after it, but only within 60 minutes —
      // forward direction + tolerance (pandas merge_asof semantics).
      val ev = Tables.events(s, d).withColumn("t", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("t"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("t").as("p_t"))
        .agg(max(col("event_id")).as("p_id"))
      asofJoin(clicks, purchases, "user_id", "t", "p_t", Seq("p_id", "p_t"),
          tolerance = Some(lit(60L * 60 * 1000 * 1000)), forward = true)
        .select(col("event_id"), col("user_id"), col("t"),
          col("asof_p_id").as("p_id"), col("asof_p_t").as("p_t"))
        .orderBy("user_id", "t", "event_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "asof_nearest" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |p AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t AS click_t, MAX(event_id) AS click_id
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, t),
        |b AS (SELECT p.event_id, p.user_id, p.t, c.click_id AS b_id, c.click_t AS b_t
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.click_t <= p.t),
        |f AS (SELECT p.event_id, c.click_id AS f_id, c.click_t AS f_t
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.click_t >= p.t),
        |pick AS (
        |  SELECT b.event_id, b.user_id, b.t,
        |    CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR b.t - b_t <= f_t - b.t)
        |      THEN b_id ELSE f_id END AS click_id,
        |    CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR b.t - b_t <= f_t - b.t)
        |      THEN b_t ELSE f_t END AS click_t
        |  FROM b JOIN f ON b.event_id = f.event_id)
        |SELECT event_id, user_id, t,
        |  CASE WHEN ABS(t - click_t) <= 1800000000 THEN click_id END AS click_id,
        |  CASE WHEN ABS(t - click_t) <= 1800000000 THEN click_t END AS click_t
        |FROM pick ORDER BY user_id, t, event_id""".stripMargin,

    "asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |p AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t AS click_t, MAX(event_id) AS click_id
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, t)
        |SELECT p.event_id, p.user_id, p.t, c.click_id, c.click_t
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.click_t <= p.t
        |ORDER BY p.user_id, p.t, p.event_id""".stripMargin,

    "asof_forward_tol" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |c AS (SELECT event_id, user_id, t FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, t AS p_t, MAX(event_id) AS p_id
        |      FROM ev WHERE event_type = 'purchase' GROUP BY user_id, t)
        |SELECT c.event_id, c.user_id, c.t,
        |  CASE WHEN p.p_t - c.t <= 3600000000 THEN p.p_id END AS p_id,
        |  CASE WHEN p.p_t - c.t <= 3600000000 THEN p.p_t END AS p_t
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND p.p_t >= c.t
        |ORDER BY c.user_id, c.t, c.event_id""".stripMargin
  )
}
