package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Tables

class SourcesSpec extends SparkSpec {

  test("partitioned snapshot write round-trips and prunes at file level") {
    val tmp = Files.createTempDirectory("graft_snap").toString
    val li = Tables.lineitem(spark, sfDir).limit(1000)
    Tables.writeSnapshot(li, tmp, partitionBy = Seq("l_returnflag"))
    val back = spark.read.parquet(tmp)
    assert(back.count() == 1000)
    // partition pruning: a filter on the partition column must reach
    // the scan as a partition filter, not a data filter
    val pruned = back.filter(col("l_returnflag") === "A")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("l_returnflag"))
  }

  test("csv and json round-trip with enforced schema") {
    val tmpC = Files.createTempDirectory("graft_csv").toString
    val tmpJ = Files.createTempDirectory("graft_json").toString
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderstatus").limit(100)
    Tables.writeCsv(orders, tmpC)
    Tables.writeJson(orders, tmpJ)
    val schema = orders.schema
    assert(Tables.readCsv(spark, tmpC, schema).count() == 100)
    assert(Tables.readJson(spark, tmpJ, schema).count() == 100)
    assert(Tables.readCsv(spark, tmpC, schema).schema == schema)
  }

  test("orc round-trips value-identical to the parquet source, with predicate pushdown") {
    val tmp = Files.createTempDirectory("graft_orc").toString
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    Tables.writeOrc(orders, tmp)
    val back = Tables.readOrc(spark, tmp, orders.schema)
    assert(back.schema == orders.schema)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    assert(canon(back) == canon(orders))
    // the filter reaches the ORC scan (PushedFilters in the plan)
    val plan = back.filter(org.apache.spark.sql.functions.col("o_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"), plan.take(500))
  }
}
