package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions
import graft.sources.Tables

class TopKPerKeySpec extends SparkSpec {

  private def windowTop3 = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }

  test("TopKPerKeyRule rewrites row_number<=k into TopKPerKeyExec") {
    GraftExtensions.register(spark)
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    val plan = windowTop3.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rule did not fire:\n$plan")
    assert(!plan.contains("WindowGroupLimit"),
      s"builtin WindowGroupLimit should be subsumed:\n$plan")
    assert(!plan.contains("Sort "), s"heap path should not sort:\n$plan")
  }

  test("operator output matches the plain window formulation exactly") {
    GraftExtensions.register(spark)
    val withOp = windowTop3.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    // recompute without the rule on a cloned session
    val vanilla = spark.newSession()
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = Tables.orders(vanilla, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    assert(withOp == expected)
    assert(withOp.nonEmpty)
  }

  test("plan includes the pre-shuffle partial prune below the exchange") {
    GraftExtensions.register(spark)
    val plan = windowTop3.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), s"partial prune missing:\n$plan")
    // partial must sit BELOW the exchange (prune before shuffling)
    val partialIdx = plan.indexOf("TopKPartial")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial should be under the exchange:\n$plan")
  }

  test("spill path: results stay exact when the key map is capped at 2") {
    GraftExtensions.register(spark)
    val expected = windowTop3.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(expected.size > 100) // many distinct keys → many spill passes
    spark.conf.set("spark.graft.topk.maxKeysInMemory", "2")
    try {
      val spilled = windowTop3.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(spilled == expected)
    } finally spark.conf.unset("spark.graft.topk.maxKeysInMemory")
  }

  test("rewrite can be disabled by conf") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.graft.topk.rewrite.enabled", "false")
    try {
      val plan = windowTop3.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), s"rewrite should be off:\n$plan")
      // and the vanilla path still returns the same rows
      val vanilla = windowTop3.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      spark.conf.set("spark.graft.topk.rewrite.enabled", "true")
      val withOp = windowTop3.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(vanilla == withOp)
    } finally spark.conf.unset("spark.graft.topk.rewrite.enabled")
  }
}
