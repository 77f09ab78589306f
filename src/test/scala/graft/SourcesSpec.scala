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

  test("Tables.events decodes identically for µs-annotated and ns-annotated parquet") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter

    // Three distinct dates × two events each — date grouping is the
    // signal that collapses to one 1970 bucket when the unit is wrong.
    val baseSec = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    val rows = (0 until 6).map { i =>
      (i.toLong, (baseSec + i / 2 * 86400 + i * 3600) * 1000000L, // µs since epoch
        (100 + i).toLong, s"type${i % 2}", i * 1.5, s"""{"k":$i}""")
    }

    // µs fixture: Spark write with TIMESTAMP_MICROS (directory shape —
    // exercises the detector's directory branch)
    val usDir = Files.createTempDirectory("graft_ev_us").toString
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      import spark.implicits._
      rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$usDir/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    // ns fixture: INT64(TIMESTAMP_NANOS) via the raw parquet writer
    // (Spark cannot emit NANOS; single-file shape like the testdata)
    val nsDir = Files.createTempDirectory("graft_ev_ns").toString
    val mt = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(PrimitiveTypeName.INT64).named("user_id")
      .required(PrimitiveTypeName.BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(PrimitiveTypeName.DOUBLE).named("value")
      .required(PrimitiveTypeName.BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val w = ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(s"$nsDir/events.parquet"))
      .withType(mt).build()
    val gf = new SimpleGroupFactory(mt)
    rows.foreach { case (id, us, uid, et, v, p) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", us * 1000L); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", p)
      w.write(g)
    }
    w.close()

    assert(Tables.eventsTsUnit(spark, usDir) == LogicalTypeAnnotation.TimeUnit.MICROS)
    assert(Tables.eventsTsUnit(spark, nsDir) == LogicalTypeAnnotation.TimeUnit.NANOS)

    def byDate(d: String) =
      Tables.events(spark, d).groupBy(to_date(col("ts")).as("d")).count()
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).sortBy(_._1).toList
    val us = byDate(usDir); val ns = byDate(nsDir)
    assert(us == ns, s"µs read $us != ns read $ns")
    assert(us.map(_._1) == List("2024-03-01", "2024-03-02", "2024-03-03"))
    assert(us.map(_._2) == List(2L, 2L, 2L))
    // exact instant parity, not just date-level
    def instants(d: String) =
      Tables.events(spark, d).select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toList
    assert(instants(usDir) == instants(nsDir))
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
