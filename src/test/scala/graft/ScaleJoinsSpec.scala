package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleJoins
import graft.sources.Tables

class ScaleJoinsSpec extends SparkSpec {

  test("bucketed co-located join plans with zero shuffles") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ScaleJoins.writeBucketed(orders, "graft_b_orders", "o_orderkey", 8)
    ScaleJoins.writeBucketed(li, "graft_b_lineitem", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at test scale both sides fit a broadcast, which would bypass the
      // bucketed path entirely; at 100 TB neither side broadcasts, so
      // model that by disabling broadcast for the assertion
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ScaleJoins.colocatedJoin(spark, "graft_b_orders", "graft_b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }

  test("salted join returns exactly the plain join's result") {
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("k"), col("l_orderkey"), col("l_quantity"))
    val dim = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = fact.join(dim, Seq("k"))
    val salted = ScaleJoins.saltedJoin(fact, dim, "k", 4)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSet == plain.columns.toSet)
    val a = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
