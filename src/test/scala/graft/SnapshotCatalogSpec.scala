package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotStore

/** SQL time travel through the DSv2 catalog: `VERSION AS OF` /
  * `TIMESTAMP AS OF` resolve SnapshotStore versions via Spark's own
  * loadTable hooks, and the planned table is a plain parquet scan
  * (native pushdown applies). */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_snapcat").toString
    val store = new SnapshotStore(spark, s"$r/orders_snap", "k")
    // backdated commit timestamps make TIMESTAMP AS OF deterministic
    store.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L, commitTs = Some(1000L))
    store.write(Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("k", "v"), 2L,
      commitTs = Some(2000L))
    spark.conf.set("spark.sql.catalog.snapcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapcat.root", r)
    r
  }

  private def rows(sql: String): Set[(Long, String)] =
    spark.sql(sql).collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet

  test("bare table name reads the latest version") {
    root: Unit
    assert(rows("SELECT k, v FROM snapcat.orders_snap") ==
      Set((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("VERSION AS OF pins an explicit version; a missing version errors") {
    root: Unit
    assert(rows("SELECT k, v FROM snapcat.orders_snap VERSION AS OF 1") ==
      Set((1L, "a"), (2L, "b")))
    assert(rows("SELECT k, v FROM snapcat.orders_snap VERSION AS OF 2") ==
      Set((1L, "a2"), (2L, "b"), (3L, "c")))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM snapcat.orders_snap VERSION AS OF 99").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("TIMESTAMP AS OF resolves by commit time: between commits → v1, after → v2, before → error") {
    root: Unit
    // commits at 1000 ms and 2000 ms epoch; session tz is UTC
    assert(rows("SELECT k, v FROM snapcat.orders_snap " +
      "TIMESTAMP AS OF TIMESTAMP'1970-01-01 00:00:01.5'") ==
      Set((1L, "a"), (2L, "b")))
    assert(rows("SELECT k, v FROM snapcat.orders_snap " +
      "TIMESTAMP AS OF TIMESTAMP'1970-01-01 00:00:02.5'") ==
      Set((1L, "a2"), (2L, "b"), (3L, "c")))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM snapcat.orders_snap " +
        "TIMESTAMP AS OF TIMESTAMP'1970-01-01 00:00:00.5'").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("the planned scan is a native parquet read with pushdown intact") {
    root: Unit
    val df = spark.sql(
      "SELECT k FROM snapcat.orders_snap VERSION AS OF 2 WHERE k >= 2")
    assert(df.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(k,2)"), plan)
  }

  test("a LINKED lineage time-travels through the same catalog, pool files read in place") {
    root: Unit
    val linked = new graft.operators.ManifestStore(spark, s"$root/events_linked", "k")
    linked.write(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v"), 1L, numFiles = 3)
    linked.mergeDelta(1L, 2L, Seq((2L, "y2")).toDF("k", "v"))
    assert(rows("SELECT k, v FROM snapcat.events_linked VERSION AS OF 1") ==
      Set((1L, "x"), (2L, "y"), (3L, "z")))
    assert(rows("SELECT k, v FROM snapcat.events_linked") ==
      Set((1L, "x"), (2L, "y2"), (3L, "z")))
    // the v1 read must plan over manifest-resolved POOL files (shared
    // by reference), not a version directory copy
    val planned = spark.sql("SELECT k FROM snapcat.events_linked VERSION AS OF 1")
      .queryExecution.executedPlan.toString
    assert(planned.contains("files"), planned)
  }

  test("namespaces: a directory level groups stores; namespaced tables time-travel") {
    root: Unit
    val ns = new SnapshotStore(spark, s"$root/teamA/nested_snap", "k")
    ns.write(Seq((7L, "n1")).toDF("k", "v"), 1L, commitTs = Some(1000L))
    ns.write(Seq((7L, "n2")).toDF("k", "v"), 2L, commitTs = Some(2000L))
    val spaces = spark.sql("SHOW NAMESPACES IN snapcat").collect()
      .map(_.getString(0))
    assert(spaces.contains("teamA"), spaces.mkString(","))
    assert(!spaces.contains("orders_snap"),
      "a store directory must not be mistaken for a namespace")
    assert(rows("SELECT k, v FROM snapcat.teamA.nested_snap VERSION AS OF 1") ==
      Set((7L, "n1")))
    assert(rows("SELECT k, v FROM snapcat.teamA.nested_snap") == Set((7L, "n2")))
    val inNs = spark.sql("SHOW TABLES IN snapcat.teamA").collect()
      .map(_.getString(1))
    assert(inNs.contains("nested_snap"))
  }

  test("a read-only catalog refuses DDL writes; listTables sees the store") {
    root: Unit
    val ids = spark.sql("SHOW TABLES IN snapcat").collect().map(_.getString(1))
    assert(ids.contains("orders_snap"))
    val e = intercept[Exception](
      spark.sql("DROP TABLE snapcat.orders_snap").collect())
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }
}
