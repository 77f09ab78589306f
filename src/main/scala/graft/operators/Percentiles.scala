package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed exact interpolated quantiles (SURVEY §7.9).
  *
  * Spark's exact `percentile()` aggregate buffers EVERY value of a
  * group in one reducer's memory (an OpenHashMap per group) — at
  * 100 TB a single group is billions of values and the reducer dies.
  * `approx_percentile` bounds memory but gives up exactness.
  *
  * This operator computes the same interpolated quantile
  * (`q*(n-1)` fractional-rank semantics — identical to Spark
  * `percentile()` and DuckDB `quantile_cont`) with bounded per-task
  * state, as two aggregate passes plus a thin candidate pass:
  *
  *  1. per-group stats (n, min, max) — one map-side-combined agg;
  *  2. a B-bucket equi-width histogram per group — one agg of size
  *     |groups|×B; a window cumsum over it locates, for each needed
  *     order statistic (floor/ceil of each quantile's fractional
  *     rank), the bucket that contains it;
  *  3. rows in needed buckets only are re-scanned and compressed to
  *     (group, value, count) — duplicate-heavy buckets collapse to
  *     one row per distinct value, so a degenerate distribution
  *     (every row the same value) costs one row, not the group.
  *     A window cumsum over the compressed candidates assigns each
  *     distinct value its global rank range; the needed order
  *     statistics join against those ranges (broadcast — the needed
  *     set is ≤ 2·|qs| rows per group).
  *
  * Every aggregate is map-side combinable and no task ever holds more
  * than (a) one histogram stripe or (b) one candidate bucket's
  * distinct values. The fact table is scanned three times — the price
  * of exactness with bounded memory; at 100 TB pass 1's min/max would
  * come free from parquet footer stats. Worst case (all needed
  * buckets still huge in DISTINCT values) would recurse the
  * bucketing; one level is enough for any real value distribution.
  *
  * Reference behavior matched: quantile over numeric column per
  * group, null values ignored (same as percentile()/quantile_cont).
  */
object Percentiles {

  private val B = 256 // histogram buckets per group

  /** Exact interpolated quantiles `qs` of `valueCol` per `groupCol`.
    * Output: one row per group — (groupCol, n, q_<label>... one double
    * column per requested quantile, in `qs` order, named by caller).
    *
    * `precomputedStats`, when given, replaces pass 1 entirely: a frame
    * of (groupCol, n, vmin, vmax) — e.g. from a snapshot manifest that
    * tracks value stats per partition ([[Snapshot.manifest]] with a
    * `statsCol`), or from parquet footer metadata. The operator then
    * scans the fact table TWICE instead of three times; results are
    * identical (spec-proven). The stats must be exact for the same
    * rows (null-value rows excluded, as pass 1 would) — quantiles pay
    * for any drift with wrong bucket boundaries, so treat stale
    * manifests as invalid here.
    *
    * @param qs (outputColumnName, quantile in [0,1]) pairs
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)],
      precomputedStats: Option[DataFrame] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 })
    val g = col(groupCol)
    val v = col(valueCol).cast(DoubleType)
    val rows = df.filter(v.isNotNull).select(g.as("__g"), v.as("__v"))

    // pass 1: per-group count / min / max — or the caller's metadata
    val stats = precomputedStats match {
      case Some(pre) => pre.select(col(groupCol).as("__g"), col("n").cast(LongType).as("__n"),
        col("vmin").cast(DoubleType).as("__vmin"), col("vmax").cast(DoubleType).as("__vmax"))
      case None => rows.groupBy("__g").agg(
        count(lit(1)).as("__n"), min("__v").as("__vmin"), max("__v").as("__vmax"))
    }

    // equi-width bucket of a value, given the group's min/max
    def bucketOf(value: Column): Column =
      when(col("__vmax") === col("__vmin"), lit(0L)).otherwise(
        least(floor((value - col("__vmin")) / (col("__vmax") - col("__vmin")) * B), lit(B - 1L))
          .cast(LongType))

    // pass 2: histogram per (group, bucket) + cumulative count before each bucket
    val hist = rows.join(broadcast(stats), "__g")
      .select(col("__g"), bucketOf(col("__v")).as("__b"))
      .groupBy("__g", "__b").agg(count(lit(1)).as("__bc"))
    val wB = Window.partitionBy("__g").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val histCum = hist.withColumn("__before", coalesce(sum("__bc").over(wB), lit(0L)))

    // needed order statistics: floor and ceil of each quantile's
    // fractional rank q*(n-1); ≤ 2·|qs| rows per group
    val neededRanks = qs.zipWithIndex.flatMap { case ((_, q), i) =>
      val pos = lit(q) * (col("__n") - 1).cast(DoubleType)
      Seq(
        struct(lit(i).as("qi"), lit(0).as("hi"), floor(pos).cast(LongType).as("rank")),
        struct(lit(i).as("qi"), lit(1).as("hi"),
          least(floor(pos).cast(LongType) + 1, col("__n") - 1).as("rank")))
    }
    val needed = stats.select(col("__g"), col("__n"),
        explode(array(neededRanks: _*)).as("__nr"))
      .select(col("__g"), col("__n"), col("__nr.qi"), col("__nr.hi"), col("__nr.rank"))

    // buckets that contain a needed rank
    val neededBuckets = needed.join(histCum, Seq("__g"))
      .filter(col("rank") >= col("__before") && col("rank") < col("__before") + col("__bc"))
      .select(col("__g"), col("__b")).distinct()

    // pass 3: candidate rows compressed to distinct (group, value, count),
    // then rank ranges via cumsum ordered by value within the group
    // (bucket id is monotone in value, so one group-wide value order
    // is correct across that group's needed buckets)
    val cands = rows.join(broadcast(stats), "__g")
      .select(col("__g"), col("__v"), bucketOf(col("__v")).as("__b"))
      .join(broadcast(neededBuckets), Seq("__g", "__b"))
      .groupBy("__g", "__b", "__v").agg(count(lit(1)).as("__vc"))
    // global rank start of each distinct value = rows before its bucket
    // (histogram) + candidate rows before it inside needed buckets.
    // Candidate cumsum alone is wrong when TWO needed buckets of one
    // group are separated by non-needed buckets — anchor each bucket
    // with its histogram __before and cumsum only within the bucket.
    val wVb = Window.partitionBy("__g", "__b").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cands
      .join(histCum.select(col("__g"), col("__b"), col("__before")), Seq("__g", "__b"))
      .withColumn("__start", col("__before") + coalesce(sum("__vc").over(wVb), lit(0L)))

    // pick the value whose rank range covers each needed statistic.
    // Broadcast side is `needed` (≤ 2·|qs| rows per group, bounded);
    // `ranked` holds every distinct candidate value — unbounded in the
    // value distribution — and must stay partitioned.
    val picked = ranked.join(broadcast(needed), Seq("__g"))
      .filter(col("rank") >= col("__start") && col("rank") < col("__start") + col("__vc"))
      .select(col("__g"), col("__n"), col("qi"), col("hi"), col("__v"))

    // interpolate: lo + frac * (hi - lo), frac = q*(n-1) - floor(q*(n-1))
    val perQ = qs.zipWithIndex.map { case ((name, q), i) =>
      val pos = lit(q) * (col("__n") - 1).cast(DoubleType)
      val lo = max(when(col("qi") === i && col("hi") === 0, col("__v")))
      val hi = max(when(col("qi") === i && col("hi") === 1, col("__v")))
      (lo + (pos - floor(pos)) * (hi - lo)).as(name)
    }
    picked.groupBy(col("__g"), col("__n"))
      .agg(perQ.head, perQ.tail: _*)
      .withColumnRenamed("__g", groupCol)
      .withColumnRenamed("__n", "n")
  }
}
