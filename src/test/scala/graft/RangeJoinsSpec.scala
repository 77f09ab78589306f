package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoins

class RangeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(0L, 5L, 10L, 17L, 23L, 100L).toDF("p")
  private def intervals = Seq(
    (1L, 0L, 5L),     // catches 0, 5 (inclusive ends)
    (2L, 4L, 22L),    // spans 3 bins at w=8: catches 5, 10, 17
    (3L, 90L, 99L),   // catches nothing (100 just out)
    (4L, 23L, 23L)    // degenerate single-point interval
  ).toDF("id", "lo", "hi")

  test("pointInInterval matches the nested-loop formulation exactly") {
    val binned = RangeJoins.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 8)
      .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(binned == Set((0L, 1L), (5L, 1L), (5L, 2L), (10L, 2L), (17L, 2L), (23L, 4L)))
  }

  test("pointInInterval emits each matching pair exactly once") {
    val out = RangeJoins.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 3)
      .groupBy("p", "id").count().filter(col("count") > 1).count()
    assert(out == 0L)
  }

  test("pointInInterval plans an equi-join on the bin, not a nested loop") {
    val plan = RangeJoins.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("fan-out guard fails fast on intervals spanning too many bins") {
    val wide = Seq((1L, 0L, 100000L)).toDF("id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoins.pointInInterval(points, "p", wide, "lo", "hi",
        binWidth = 2, maxBinsPerInterval = 16)
    }
    assert(e.getMessage.contains("bins"))
  }

  test("negative coordinates bin consistently (pre-epoch timestamps)") {
    val p = Seq(-10L, -1L, 0L, 1L).toDF("p")
    val iv = Seq((1L, -12L, -1L), (2L, -2L, 2L)).toDF("id", "lo", "hi")
    val binned = RangeJoins.pointInInterval(p, "p", iv, "lo", "hi", binWidth = 8)
      .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = p.crossJoin(iv)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
  }

  test("intervalOverlap matches the nested-loop formulation, one row per pair") {
    val left = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 5L, 25L)).toDF("a_id", "a_lo", "a_hi")
    val right = Seq((10L, 8L, 12L), (20L, 28L, 40L), (30L, 50L, 60L)).toDF("b_id", "b_lo", "b_hi")
    val binned = RangeJoins.intervalOverlap(left, "a_lo", "a_hi", right, "b_lo", "b_hi", 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.crossJoin(right)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned.toSet == naive)
    assert(binned.length == naive.size, "a pair must meet in exactly one canonical bin")
    assert(binned.toSet == Set((1L, 10L), (3L, 10L), (2L, 20L)))
  }
}
