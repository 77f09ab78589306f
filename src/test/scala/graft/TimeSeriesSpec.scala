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
