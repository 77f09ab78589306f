package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Fx
import graft.sources.Tables

/** Binned range join: point-in-interval joins WITHOUT an equi key.
  *
  * A naive `points JOIN intervals ON lo <= p AND p <= hi` has no
  * equality conjunct, so Spark plans a broadcast-nested-loop —
  * O(|points| × |intervals|) comparisons, a cluster-killer the moment
  * neither side is tiny. The standard fix (Databricks' range-join
  * optimization, Flink's interval join) re-expresses the range as an
  * equality on BINS of width `binWidth`:
  *
  *  - each interval registers in every bin it overlaps
  *    (`sequence(floor(lo/w), floor(hi/w))` — a narrow generator),
  *  - each point registers in exactly ONE bin (`floor(p/w)`),
  *  - a plain equi-JOIN on the bin id carries the shuffle, and the
  *    exact `lo <= p <= hi` predicate filters inside the join.
  *
  * Each matching (point, interval) pair meets in exactly one bin — the
  * point's — so no dedup pass is needed; the output is exactly the
  * BNLJ's. Cost: shuffle |points| + |intervals| × avg(span/w + 1) rows,
  * comparisons only within a bin. `binWidth` ≈ the typical interval
  * length keeps interval fan-out at ~2 rows.
  *
  * Skew/abuse guard: a degenerate interval (hi − lo ≫ binWidth) would
  * fan out into thousands of bin rows; `maxBinsPerInterval` fails fast
  * instead of silently exploding the shuffle (same fail-fast posture as
  * Dedup's broadcast gate). Raise it deliberately, or widen `binWidth`.
  */
object RangeJoins {

  /** Join `points` to every interval of `intervals` containing them:
    * `lo <= p <= hi` (both ends inclusive). `pCol`, `loCol`, `hiCol`
    * must be integral (epoch days/seconds/micros — callers convert
    * timestamps first so bin arithmetic is exact). Output columns:
    * points' then intervals'; names must not collide. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    // fail fast on fan-out abuse (widest interval's bin count) and on
    // coordinates outside floorDiv's exact double domain — one tiny
    // aggregate over the (typically small) interval side
    val worst = intervals
      .agg(max(floorDiv(col(hiCol), w) - floorDiv(col(loCol), w) + 1),
        max(greatest(abs(col(loCol).cast(LongType)), abs(col(hiCol).cast(LongType))))).head()
    if (!worst.isNullAt(0)) {
      val maxBins = worst.getLong(0)
      require(maxBins <= maxBinsPerInterval,
        s"an interval spans $maxBins bins (> $maxBinsPerInterval); " +
          s"widen binWidth=$binWidth or raise maxBinsPerInterval")
      require(worst.getLong(1) <= (1L << 53),
        s"interval bounds exceed 2^53 — bin arithmetic would lose exactness; " +
          "rescale the coordinate (epoch days/seconds instead of micros)")
    }
    val binned = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col(loCol), w), floorDiv(col(hiCol), w))))
    points.withColumn("__bin", floorDiv(col(pCol), w))
      .join(binned, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs (a, b) whose ranges intersect —
    * `aLo <= bHi AND bLo <= aHi`. Same binning trick, both sides
    * explode; a pair can meet in several shared bins, so the match is
    * attributed to ONE canonical bin (the overlap's first:
    * `max(floor(aLo/w), floor(bLo/w))`) instead of a dedup shuffle. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Long, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    def binsOf(df: DataFrame, lo: String, hi: String): DataFrame = {
      val worst = df.agg(max(floorDiv(col(hi), w) - floorDiv(col(lo), w) + 1)).head()
      if (!worst.isNullAt(0)) require(worst.getLong(0) <= maxBinsPerInterval,
        s"an interval spans ${worst.getLong(0)} bins (> $maxBinsPerInterval)")
      df.withColumn("__bin", explode(sequence(floorDiv(col(lo), w), floorDiv(col(hi), w))))
    }
    binsOf(left, lLo, lHi).join(binsOf(right, rLo, rHi), Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      // keep the pair only in the first bin both sides share
      .filter(col("__bin") === greatest(floorDiv(col(lLo), w), floorDiv(col(rLo), w)))
      .drop("__bin")
  }

  /** Floor division as a Column. Routed through double `floor`, exact
    * while |a| ≤ 2^53 (epoch days/seconds/micros all qualify until far
    * beyond any real date range; the interval-side guard enforces it). */
  private def floorDiv(a: Column, b: Column): Column =
    floor(a.cast(LongType) / b).cast(LongType)

  private val usPerDay = 86400000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> { (s, d) =>
      // Shipments caught by each urgent March-1995 order's 7-day promo
      // window — point-in-interval with NO equi key (any order's window
      // catches any lineitem). Bin width = the window length, so every
      // interval lands in at most 2 bins.
      val days = (c: Column) => floorDiv(unix_micros(c.cast("timestamp")), lit(usPerDay))
      val windows = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT"
          && col("o_orderdate") >= "1995-03-01" && col("o_orderdate") < "1995-04-01")
        .select(col("o_orderkey"), days(col("o_orderdate")).as("lo"))
        .withColumn("hi", col("lo") + 6)
      val shipped = Tables.lineitem(s, d)
        .select(col("l_quantity"), days(col("l_shipdate")).as("p"))
      pointInInterval(shipped, "p", windows, "lo", "hi", binWidth = 7)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped"),
          round(sum(Fx.decV(col("l_quantity"))).cast(DoubleType), 2).as("sum_qty"))
        .orderBy("o_orderkey")
    }
  )

  val oracles: Map[String, String] = Map(
    // the declarative (nested-loop) formulation — proves the binned
    // plan computes exactly the range-join semantics
    "q_range_join" ->
      """WITH w AS (
        |  SELECT o_orderkey,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS lo
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |    AND o_orderdate >= '1995-03-01' AND o_orderdate < '1995-04-01'),
        |p AS (
        |  SELECT l_quantity,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS p
        |  FROM lineitem)
        |SELECT o_orderkey, COUNT(*) AS n_shipped,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty
        |FROM p JOIN w ON p.p >= w.lo AND p.p <= w.lo + 6
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin
  )
}
