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

  test("unsupported DDL verbs refuse loudly; listTables sees the store") {
    root: Unit
    val ids = spark.sql("SHOW TABLES IN snapcat").collect().map(_.getString(1))
    assert(ids.contains("orders_snap"))
    // SET TBLPROPERTIES is outside the supported verb set (DROP/RENAME
    // are real DDL now — spec'd separately on scratch tables)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE snapcat.orders_snap SET TBLPROPERTIES ('a'='b')").collect())
    assert(e.getMessage.contains("does not support")
      || e.getMessage.toLowerCase.contains("alter"), e.getMessage)
    val e2 = intercept[Exception](spark.sql("CREATE NAMESPACE snapcat.newns"))
    assert(e2.getMessage.contains("does not support"), e2.getMessage)
  }

  test("fill policy projects into the SQL scan: SQL read == store API read on an evolved version") {
    root: Unit
    val store = new SnapshotStore(spark, s"$root/fill_snap", "k")
    store.writeRangePartitioned(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), 1L, 2)
    // evolve with a fill; one delta row carries an EXPLICIT null for
    // the new column — it must read as the fill on BOTH surfaces
    val delta = Seq((2L, "b2", Some(5L)), (4L, "d", None)).toDF("k", "v", "w")
    store.mergeDelta(1L, 2L, delta, fill = Map("w" -> -1L))
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toSet
    val api = setOf(store.read(2L))
    val sql = setOf(spark.sql("SELECT k, v, w FROM snapcat.fill_snap"))
    assert(sql == api, s"sql=$sql api=$api")
    // carried pre-evolution row reads the fill (not null) in SQL …
    assert(sql.contains((1L, "a", -1L)))
    // … and so does the explicit-null delta row
    assert(sql.contains((4L, "d", -1L)))
  }

  test("SQL DELETE publishes a new version on a snapshot store; history stays readable") {
    root: Unit
    val store = new SnapshotStore(spark, s"$root/del_snap", "k")
    store.writeRangePartitioned(
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), 1L, 2,
      commitTs = Some(1000L))
    spark.sql("DELETE FROM snapcat.del_snap WHERE k > 5")
    assert(store.versions() == Seq(1L, 2L))
    assert(rows("SELECT k, v FROM snapcat.del_snap") ==
      (1L to 5L).map(k => (k, s"v$k")).toSet)
    assert(rows("SELECT k, v FROM snapcat.del_snap VERSION AS OF 1") ==
      (1L to 10L).map(k => (k, s"v$k")).toSet)
    // an untranslatable predicate fails loud, publishing nothing
    intercept[Exception](spark.sql("DELETE FROM snapcat.del_snap WHERE k % 2 = 0"))
    assert(store.versions() == Seq(1L, 2L))
  }

  test("SQL DELETE on a linked store rides deleteWhere; an emptied version still plans") {
    root: Unit
    val linked = new graft.operators.ManifestStore(spark, s"$root/del_linked", "k")
    linked.write((1L to 8L).map(k => (k, s"x$k")).toDF("k", "v"), 1L, numFiles = 2)
    spark.sql("DELETE FROM snapcat.del_linked WHERE v = 'x3'")
    assert(linked.versions() == Seq(1L, 2L))
    assert(rows("SELECT k, v FROM snapcat.del_linked") ==
      (1L to 8L).filterNot(_ == 3L).map(k => (k, s"x$k")).toSet)
    // delete EVERYTHING: the zero-file version must read as empty, not
    // throw out of loadTable
    spark.sql("DELETE FROM snapcat.del_linked WHERE k >= 1")
    assert(spark.sql("SELECT * FROM snapcat.del_linked").count() == 0L)
    assert(rows("SELECT k, v FROM snapcat.del_linked VERSION AS OF 1") ==
      (1L to 8L).map(k => (k, s"x$k")).toSet)
  }

  test("SQL TRUNCATE TABLE rides the delete hook: new empty version, history intact") {
    root: Unit
    val store = new SnapshotStore(spark, s"$root/trunc_snap", "k")
    store.writeRangePartitioned(
      (1L to 6L).map(k => (k, s"t$k")).toDF("k", "v"), 1L, 2,
      commitTs = Some(1000L))
    spark.sql("TRUNCATE TABLE snapcat.trunc_snap")
    assert(store.versions() == Seq(1L, 2L))
    assert(spark.sql("SELECT * FROM snapcat.trunc_snap").count() == 0L)
    assert(rows("SELECT k, v FROM snapcat.trunc_snap VERSION AS OF 1") ==
      (1L to 6L).map(k => (k, s"t$k")).toSet)
  }

  test("<store>.history metadata table: both layouts, metadata-only LocalScan plan") {
    root: Unit
    val linked = new graft.operators.ManifestStore(spark, s"$root/hist_linked", "k")
    linked.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L, 2, commitTs = Some(1000L))
    linked.mergeDelta(1L, 2L, Seq((3L, "c")).toDF("k", "v"), commitTs = Some(2000L))
    def hist(t: String): Seq[(Long, Long, Long)] =
      spark.sql(s"SELECT version, commit_ts, n_rows FROM snapcat.$t.history ORDER BY version")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // snapshot layout: the lazy-root fixture store (2 + 3 rows)
    assert(hist("orders_snap") == Seq((1L, 1000L, 2L), (2L, 2000L, 3L)))
    // linked layout: carries file references; footers never read twice
    assert(hist("hist_linked") == Seq((1L, 1000L, 2L), (2L, 2000L, 3L)))
    // n_files is positive and the plan is a LocalTableScan (no files)
    val df = spark.sql("SELECT * FROM snapcat.orders_snap.history")
    assert(df.collect().forall(_.getAs[Long]("n_files") > 0))
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString)
    // a missing store still errors (the fallback never invents tables)
    val e = intercept[Exception](spark.sql("SELECT * FROM snapcat.nope.history").collect())
    assert(e.getMessage != null)
  }

  test("ALTER TABLE ADD COLUMN evolves both layouts: defaults fill, history immutable, refusals hold") {
    root: Unit
    val snap = new SnapshotStore(spark, s"$root/alter_snap", "k")
    snap.writeRangePartitioned(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), 1L, 2,
      commitTs = Some(1000L))
    val linked = new graft.operators.ManifestStore(spark, s"$root/alter_linked", "k")
    linked.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), 1L, 2, commitTs = Some(1000L))
    for (t <- Seq("alter_snap", "alter_linked")) {
      spark.sql(s"ALTER TABLE snapcat.$t ADD COLUMN score DOUBLE DEFAULT 1.5")
      // SQL scan: old files read the default through EXISTS_DEFAULT
      val got = spark.sql(s"SELECT k, v, score FROM snapcat.$t").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 10.0, 1.5), (2L, 20.0, 1.5)), t)
      // history immutable: v1 still plans with its own (narrower) schema
      assert(spark.sql(s"SELECT * FROM snapcat.$t VERSION AS OF 1").columns.toSeq
        == Seq("k", "v"), t)
    }
    // store-API read agrees with SQL on the evolved linked version
    val api = linked.read(2L).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(api == Set((1L, 1.5), (2L, 1.5)))
    // a later merge materializes the fill and keeps it for carried files
    linked.mergeDelta(2L, 3L, Seq((3L, 30.0, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v", "score"))
    assert(linked.read(3L).collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      == Set((1L, 1.5), (2L, 1.5), (3L, 1.5))) // explicit null reads as fill
    // refusals: NOT NULL without DEFAULT, nested columns, non-ADD changes
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE snapcat.alter_snap ADD COLUMN req STRING NOT NULL"))
    assert(e1.getMessage.contains("DEFAULT"), e1.getMessage)
    // a NON-widening type change refuses (widenings are supported —
    // TypeWideningSpec; double -> string would corrupt old files)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE snapcat.alter_snap ALTER COLUMN v TYPE STRING"))
    assert(e2.getMessage.toLowerCase.contains("widening"), e2.getMessage)
  }

  test("ALTER TABLE DROP COLUMN narrows the tip on both layouts; RENAME rewrites; history keeps both") {
    root: Unit
    val data = Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("k", "v", "tag")
    val snap = new SnapshotStore(spark, s"$root/evo_snap", "k")
    snap.writeRangePartitioned(data, 1L, 2, commitTs = Some(1000L))
    val linked = new graft.operators.ManifestStore(spark, s"$root/evo_linked", "k")
    linked.write(data, 1L, 2, commitTs = Some(1000L))
    val poolBefore = new java.io.File(s"$root/evo_linked/files").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    for (t <- Seq("evo_snap", "evo_linked")) {
      spark.sql(s"ALTER TABLE snapcat.$t DROP COLUMN tag")
      assert(spark.sql(s"SELECT * FROM snapcat.$t").columns.toSeq == Seq("k", "v"), t)
      // pinned pre-drop read still carries the column with its values
      val v1 = spark.sql(s"SELECT * FROM snapcat.$t VERSION AS OF 1").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(v1 == Set((1L, "x"), (2L, "y")), t)
      spark.sql(s"ALTER TABLE snapcat.$t RENAME COLUMN v TO price")
      val tip = spark.sql(s"SELECT k, price FROM snapcat.$t").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(tip == Set((1L, 10.0), (2L, 20.0)), t)
      assert(spark.sql(s"SELECT * FROM snapcat.$t VERSION AS OF 2").columns.toSeq
        == Seq("k", "v"), t)
    }
    // the linked DROP moved zero pool bytes: version 2 references the
    // SAME pool files (metadata-only narrowing); only the RENAME (v3)
    // landed new ones
    val v2files = linked.manifest(2L).select("file").collect().map(_.getString(0)).toSet
    assert(v2files == poolBefore, "linked DROP COLUMN rewrote pool files")
    // post-drop merge: a delta in the NARROWED schema lands cleanly
    linked.mergeDelta(3L, 4L, Seq((3L, 30.0)).toDF("k", "price"))
    assert(linked.read(4L).select("k", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    snap.mergeDelta(3L, 4L, Seq((3L, 30.0)).toDF("k", "price"))
    assert(snap.read(4L).select("k", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // refusals: the key column is store identity
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE snapcat.evo_snap DROP COLUMN k"))
    assert(e1.getMessage.contains("key column"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE snapcat.evo_linked RENAME COLUMN k TO id"))
    assert(e2.getMessage.contains("key column"), e2.getMessage)
  }

  test("CREATE TABLE lands an empty readable v1 on both layouts; INSERT then appends v2") {
    root: Unit
    for ((t, layout) <- Seq(("create_snap", "snapshot"), ("create_linked", "linked"))) {
      spark.sql(s"CREATE TABLE snapcat.$t (k BIGINT, v STRING) " +
        s"TBLPROPERTIES('key'='k', 'layout'='$layout')")
      // readable immediately, zero rows, declared schema
      val empty = spark.sql(s"SELECT * FROM snapcat.$t")
      assert(empty.columns.toSeq == Seq("k", "v"), t)
      assert(empty.count() == 0L, t)
      // the store API agrees: v1 exists and reads empty
      if (layout == "linked") {
        val st = new graft.operators.ManifestStore(spark, s"$root/$t", "k")
        assert(st.versions() == Seq(1L) && st.read(1L).count() == 0L, t)
      } else {
        val st = new SnapshotStore(spark, s"$root/$t", "k")
        assert(st.versions() == Seq(1L) && st.read(1L).count() == 0L, t)
      }
      spark.sql(s"INSERT INTO snapcat.$t VALUES (1, 'a'), (2, 'b')")
      assert(rows(s"SELECT k, v FROM snapcat.$t") == Set((1L, "a"), (2L, "b")), t)
      // history: v1 is still the empty created state
      assert(spark.sql(s"SELECT * FROM snapcat.$t VERSION AS OF 1").count() == 0L, t)
    }
    // duplicate CREATE refuses; IF NOT EXISTS is a no-op
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE snapcat.create_snap (k BIGINT) TBLPROPERTIES('key'='k')"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    spark.sql("CREATE TABLE IF NOT EXISTS snapcat.create_snap (k BIGINT) " +
      "TBLPROPERTIES('key'='k')")
    assert(rows("SELECT k, v FROM snapcat.create_snap") == Set((1L, "a"), (2L, "b")))
    // PARTITIONED BY (identity) creates an empty readable v1 too
    spark.sql(
      "CREATE TABLE snapcat.create_part (k BIGINT, p STRING) PARTITIONED BY (p)")
    assert(spark.sql("SELECT * FROM snapcat.create_part").count() == 0L)
    // refusals: a key column missing from the schema, an unknown layout
    val e3 = intercept[Exception](spark.sql(
      "CREATE TABLE snapcat.create_badkey (k BIGINT) TBLPROPERTIES('key'='nope')"))
    assert(e3.getMessage.contains("key column"), e3.getMessage)
    val e4 = intercept[Exception](spark.sql(
      "CREATE TABLE snapcat.create_badlay (k BIGINT) TBLPROPERTIES('layout'='x')"))
    assert(e4.getMessage.contains("layout"), e4.getMessage)
  }

  test("CTAS writes the query result as v2 over the created empty v1; MERGE then works on it") {
    root: Unit
    spark.range(1, 6).selectExpr("id AS k", "CAST(id * 10 AS DOUBLE) AS v")
      .createOrReplaceTempView("ctas_spec_src")
    spark.sql("CREATE TABLE snapcat.ctas_linked " +
      "TBLPROPERTIES('key'='k', 'layout'='linked') " +
      "AS SELECT * FROM ctas_spec_src")
    assert(spark.sql("SELECT * FROM snapcat.ctas_linked").count() == 5L)
    assert(spark.sql("SELECT * FROM snapcat.ctas_linked VERSION AS OF 1").count() == 0L)
    // the created table carries the full DML surface: MERGE onto it
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    spark.sql("""MERGE INTO snapcat.ctas_linked t USING ctas_spec_src s
      |ON t.k = s.k WHEN MATCHED AND s.k = 3 THEN DELETE
      |WHEN MATCHED THEN UPDATE SET v = s.v + 1""".stripMargin)
    val got = spark.sql("SELECT k, v FROM snapcat.ctas_linked").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 11.0), (2L, 21.0), (4L, 41.0), (5L, 51.0)))
  }

  test("the files metadata table serves per-file tip layout for both layouts") {
    root: Unit
    val snap = new SnapshotStore(spark, s"$root/files_snap", "k")
    snap.writeRangePartitioned((1L to 30L).map(i => (i, i * 1.0)).toDF("k", "v"), 1L, 3)
    val f1 = spark.sql("SELECT * FROM snapcat.files_snap.files").collect()
    assert(f1.length == 3)
    assert(f1.map(_.getAs[Long]("n_rows")).sum == 30L)
    assert(f1.forall(r => r.getAs[Long]("bytes") > 0L))
    assert(f1.forall(r => r.getAs[Long]("min_key") <= r.getAs[Long]("max_key")))
    val lk = new graft.operators.ManifestStore(spark, s"$root/files_linked", "k")
    lk.write((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, numFiles = 2)
    lk.mergeDelta(1L, 2L, Seq((5L, "x")).toDF("k", "v"))
    val f2 = spark.sql("SELECT * FROM snapcat.files_linked.files").collect()
    // the TIP's manifest: carried + rewritten files, row total unchanged
    assert(f2.map(_.getAs[Long]("n_rows")).sum == 20L)
    assert(f2.forall(r => r.getAs[Long]("bytes") > 0L))
    // a plain write without a zone map reports names+bytes, stats null
    val plain = new SnapshotStore(spark, s"$root/files_plain", "k")
    plain.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L)
    val f3 = spark.sql("SELECT * FROM snapcat.files_plain.files").collect()
    assert(f3.nonEmpty && f3.forall(r => r.isNullAt(r.fieldIndex("n_rows"))))
    assert(f3.forall(r => r.getAs[Long]("bytes") > 0L))
  }

  test("CALL compact folds linked pool fragments into a new version; reads unchanged") {
    root: Unit
    val st = new graft.operators.ManifestStore(spark, s"$root/call_compact", "k")
    st.write((1L to 60L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, numFiles = 6,
      commitTs = Some(1000L))
    val res = spark.sql(
      "CALL snapcat.compact('call_compact', 2, 1048576)").collect().head
    assert(res.getString(0) == "linked")
    assert(res.getLong(1) == 2L) // a NEW version — history immutable
    assert(res.getLong(2) == 6L && res.getLong(3) == 2L, res)
    // identical rows through SQL on the compacted tip AND the old tip
    assert(spark.sql("SELECT * FROM snapcat.call_compact").count() == 60L)
    assert(rows("SELECT k, v FROM snapcat.call_compact VERSION AS OF 1") ==
      rows("SELECT k, v FROM snapcat.call_compact VERSION AS OF 2"))
    // the system-namespace spelling resolves too (nothing to fold now:
    // v3 publishes with the 2 compacted files carried by reference)
    val res2 = spark.sql(
      "CALL snapcat.system.compact('call_compact', 2, 1048576)").collect().head
    assert(res2.getLong(3) <= 2L)
  }

  test("CALL parity/repair/replicate: the durability ladder through SQL") {
    root: Unit
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = new graft.operators.ManifestStore(spark, s"$root/call_dur", "k")
    st.write((1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, numFiles = 4,
      commitTs = Some(1000L))
    // parity: first call builds sidecars, none skipped; repair: no-op
    val p = spark.sql("CALL snapcat.parity('call_dur')").collect().head
    assert(p.getLong(1) > 0L && p.getLong(2) == 0L, p)
    val r0 = spark.sql("CALL snapcat.repair('call_dur')").collect().head
    assert(r0.getString(0) == "parity" && r0.getLong(1) == 0L && r0.getLong(2) == 0L)
    // replicate onto a catalog table name, then read the mirror via SQL
    val rep = spark.sql("CALL snapcat.replicate('call_dur', 'call_dur_m')").collect().head
    assert(rep.getLong(0) == 4L && rep.getLong(2) == 1L, rep)
    assert(spark.sql("SELECT * FROM snapcat.call_dur_m").count() == 40L)
    assert(rows("SELECT k, v FROM snapcat.call_dur") ==
      rows("SELECT k, v FROM snapcat.call_dur_m"))
    // lose one pool file; CALL repair reconstructs it from parity and
    // the damaged table reads green again through SQL
    val pool = new org.apache.hadoop.fs.Path(s"$root/call_dur/files")
    val victim = fsys.listStatus(pool).filter(_.isFile)
      .map(_.getPath).minBy(_.getName)
    fsys.delete(victim, false)
    val r1 = spark.sql("CALL snapcat.repair('call_dur')").collect().head
    assert(r1.getString(0) == "parity" && r1.getLong(1) == 1L && r1.getLong(2) == 0L, r1)
    assert(spark.sql("SELECT * FROM snapcat.call_dur").count() == 40L)
    // wipe the parity sidecars AND a file: the parity rung refuses,
    // the mirror rung restores
    fsys.delete(new org.apache.hadoop.fs.Path(s"$root/call_dur/_pool_parity"), true)
    fsys.delete(victim, false)
    val r2 = spark.sql("CALL snapcat.repair('call_dur')").collect().head
    assert(r2.getLong(1) == 0L)
    val r3 = spark.sql("CALL snapcat.repair('call_dur', 'call_dur_m')").collect().head
    assert(r3.getString(0) == "mirror" && r3.getLong(1) == 1L && r3.getLong(2) == 0L, r3)
    assert(rows("SELECT k, v FROM snapcat.call_dur") ==
      rows("SELECT k, v FROM snapcat.call_dur_m"))
    // snapshot layout refuses the ladder with a pointer to clone
    val snap = new SnapshotStore(spark, s"$root/call_dur_snap", "k")
    snap.write(Seq((1L, "a")).toDF("k", "v"), 1L)
    val e = intercept[UnsupportedOperationException](
      spark.sql("CALL snapcat.parity('call_dur_snap')").collect())
    assert(e.getMessage.contains("linked layout"))
  }

  test("CALL compact rewrites a snapshot tip in place, preserving identity and commit ts") {
    root: Unit
    val st = new SnapshotStore(spark, s"$root/call_csnap", "k")
    st.writeRangePartitioned((1L to 40L).map(i => (i, i * 2.0)).toDF("k", "v"), 1L, 8,
      commitTs = Some(5000L))
    val res = spark.sql("CALL snapcat.compact('call_csnap', 2)").collect().head
    assert(res.getString(0) == "snapshot" && res.getLong(1) == 1L)
    assert(res.getLong(2) == 8L && res.getLong(3) < 8L, res)
    assert(st.versions() == Seq(1L)) // same version, fewer files
    assert(st.commitTimestamp(1L) == 5000L)
    assert(spark.sql("SELECT * FROM snapcat.call_csnap").count() == 40L)
  }

  test("CALL vacuum reclaims only unreferenced pool files; CALL retention prunes history") {
    root: Unit
    val st = new graft.operators.ManifestStore(spark, s"$root/call_vac", "k")
    st.write((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, numFiles = 4,
      commitTs = Some(1000L))
    st.mergeDelta(1L, 2L, Seq((1L, "v1x")).toDF("k", "v"), commitTs = Some(2000L))
    // both versions live → every pool file referenced → vacuum finds 0
    val v0 = spark.sql("CALL snapcat.vacuum('call_vac')").collect().head
    assert(v0.getString(0) == "linked" && v0.getLong(1) == 0L && v0.getString(2) == "bytes")
    // dry run: the ref-count audit's answer, nothing deleted
    val dr = spark.sql("CALL snapcat.vacuum('call_vac', 24, true)").collect().head
    assert(dr.getLong(1) == 0L && dr.getString(2) == "bytes_dry")
    // retention to the tip: v1's exclusive files become reclaimable,
    // and the linked prune's ref-count sweep reclaims them in the call
    val r = spark.sql("CALL snapcat.retention('call_vac', 1)").collect().head
    assert(r.getString(0) == "linked" && r.getLong(1) == 1L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM snapcat.call_vac VERSION AS OF 1").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    assert(spark.sql("SELECT * FROM snapcat.call_vac").count() == 20L)
    // unknown procedure refuses loudly
    val e2 = intercept[Exception](spark.sql("CALL snapcat.nope('x')").collect())
    assert(e2.getMessage.contains("procedure") || e2.getMessage.contains("nope"),
      e2.getMessage)
    // the procedure surface is discoverable
    val procs = spark.sql("SHOW PROCEDURES IN snapcat").collect()
      .map(_.mkString(" ")).mkString(" ")
    assert(procs.contains("compact") && procs.contains("vacuum")
      && procs.contains("retention"), procs)
  }

  test("CALL zorder clusters a new version on both layouts; pruning works right after") {
    root: Unit
    // linked: v2 gains per-file (k, c) envelopes; rows unchanged
    val lk = new graft.operators.ManifestStore(spark, s"$root/call_zo", "k")
    lk.write((1L to 64L).map(i => (i, i % 8, s"v$i")).toDF("k", "c", "v"),
      1L, numFiles = 4, commitTs = Some(1000L))
    val res = spark.sql("CALL snapcat.zorder('call_zo', 'k,c', 4)").collect().head
    assert(res.getString(0) == "linked" && res.getLong(1) == 2L)
    assert(res.getLong(2) == 4L && res.getString(3) == "k,c", res)
    assert(rows("SELECT k, v FROM snapcat.call_zo VERSION AS OF 1") ==
      rows("SELECT k, v FROM snapcat.call_zo VERSION AS OF 2"))
    // the fresh manifest carries c envelopes → readWhereAll prunes on
    // BOTH dimensions and still equals the full-scan filter
    val zoSt = new graft.operators.ManifestStore(spark, s"$root/call_zo", "k",
      statsCols = Seq("c"))
    val picked = zoSt.readWhereAll(2L, Seq(("k", 1L, 16L), ("c", 0L, 1L)))
    assert(picked.collect().map(_.getAs[Long]("k")).sorted.toSeq ==
      (1L to 16L).filter(i => i % 8 <= 1).sorted)
    // snapshot layout: new version + rebuilt zone map
    val sn = new SnapshotStore(spark, s"$root/call_zsnap", "k")
    sn.writeRangePartitioned((1L to 40L).map(i => (i, i % 5)).toDF("k", "c"), 1L, 4)
    val res2 = spark.sql("CALL snapcat.zorder('call_zsnap', 'k,c', 2)").collect().head
    assert(res2.getString(0) == "snapshot" && res2.getLong(1) == 2L
      && res2.getLong(2) == 2L, res2)
    assert(spark.sql("SELECT * FROM snapcat.call_zsnap").count() == 40L)
    // a single z column is plain range layout — refuse loudly
    val e = intercept[Exception](
      spark.sql("CALL snapcat.zorder('call_zo', 'k')").collect())
    assert(e.getMessage.contains("MULTIPLE"), e.getMessage)
  }

  test("DROP TABLE removes the store; RENAME TO moves it with every version intact") {
    root: Unit
    spark.sql("CREATE TABLE snapcat.drop_me (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    spark.sql("INSERT INTO snapcat.drop_me VALUES (1, 'a')")
    spark.sql("DROP TABLE snapcat.drop_me")
    val e = intercept[Exception](spark.sql("SELECT * FROM snapcat.drop_me").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    assert(!new java.io.File(s"$root/drop_me").exists())
    spark.sql("DROP TABLE IF EXISTS snapcat.drop_me") // absent → no-op
    spark.sql("CREATE TABLE snapcat.ren_a (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    spark.sql("INSERT INTO snapcat.ren_a VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE snapcat.ren_a VALUES (3, 'c')")
    spark.sql("ALTER TABLE snapcat.ren_a RENAME TO ren_b")
    // relocatable repository: all three versions read at the new name
    assert(rows("SELECT k, v FROM snapcat.ren_b") == Set((3L, "c")))
    assert(rows("SELECT k, v FROM snapcat.ren_b VERSION AS OF 2") ==
      Set((1L, "a"), (2L, "b")))
    assert(!new java.io.File(s"$root/ren_a").exists())
    // renaming ONTO an existing table refuses
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE snapcat.ren_b RENAME TO create_snap"))
    assert(e2.getMessage.toLowerCase.contains("exists"), e2.getMessage)
  }

  test("PARTITIONED BY through SQL: create, insert, .partitions, CALL drop_partitions, history intact") {
    root: Unit
    org.apache.spark.sql.graft.GraftExtensions.register(spark) // dynamic-overwrite strategy
    for (layout <- Seq("linked", "snapshot")) {
      val t = s"snapcat.part_$layout"
      spark.sql(s"CREATE TABLE $t (k BIGINT, cat STRING, x DOUBLE) " +
        s"PARTITIONED BY (cat) TBLPROPERTIES('key'='k', 'layout'='$layout')")
      spark.sql(
        s"INSERT INTO $t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0), (4, 'c', 4.0)")
      // SHOW PARTITIONS as a metadata table: values + row counts exact
      val parts = spark.sql(s"SELECT cat, n_rows FROM $t.partitions ORDER BY cat")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(parts == Seq(("a", 2L), ("b", 1L), ("c", 1L)), s"$layout: $parts")
      // the retention verb: drop partition 'a' (v3)
      val res = spark.sql(
        s"CALL snapcat.drop_partitions('part_$layout', 'cat', 'a')").collect().head
      assert(res.getString(0) == layout && res.getLong(1) == 3L &&
        res.getLong(2) >= 1L && res.getLong(3) == 2L, s"$layout: $res")
      assert(spark.sql(s"SELECT k FROM $t").collect().map(_.getLong(0)).toSet ==
        Set(2L, 4L))
      // pinned history still reads the dropped partition
      assert(spark.sql(s"SELECT k FROM $t VERSION AS OF 2")
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      assert(spark.sql(s"SELECT cat FROM $t.partitions ORDER BY cat")
        .collect().map(_.getString(0)).toSeq == Seq("b", "c"))
      // dynamic INSERT OVERWRITE replaces ONLY the partitions present
      // in the incoming rows (classic dynamic partition overwrite)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        spark.sql(s"INSERT OVERWRITE $t VALUES (20, 'b', 9.0)")
        assert(spark.sql(s"SELECT k FROM $t").collect().map(_.getLong(0)).toSet ==
          Set(20L, 4L), s"$layout: dynamic overwrite must keep partition c")
      } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      // static mode keeps full-replacement semantics
      spark.sql(s"INSERT OVERWRITE $t VALUES (30, 'c', 1.0)")
      assert(spark.sql(s"SELECT k FROM $t").collect().map(_.getLong(0)).toSet ==
        Set(30L), s"$layout: static overwrite is a full replacement")
    }
    // identity + temporal transforms translate to the stores' layout
    // (days/months land derived identity columns — TemporalPartitionSpec
    // covers them); bucketing stays refused (key-clustering covers it)
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE snapcat.part_bad (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (bucket(4, ts)) TBLPROPERTIES('key'='k')"))
    assert(e.getMessage.contains("bucket"), e.getMessage)
  }

  test("CALL analyze persists column stats; <store>.stats serves them; unanalyzed has no table") {
    root: Unit
    for (layout <- Seq("linked", "snapshot")) {
      val t = s"an_$layout"
      spark.sql(s"CREATE TABLE snapcat.$t (k BIGINT, v STRING) " +
        s"TBLPROPERTIES('key'='k', 'layout'='$layout')")
      spark.sql(s"INSERT INTO snapcat.$t VALUES (1, 'a'), (2, 'b'), (3, NULL), (4, 'b')")
      // unanalyzed: the .stats metadata table does not resolve yet
      val miss = intercept[Exception](spark.sql(s"SELECT * FROM snapcat.$t.stats").collect())
      assert(miss.getMessage.toLowerCase.contains("table"), miss.getMessage)
      val r = spark.sql(s"CALL snapcat.analyze('$t', true)").collect().head
      assert(r.getString(0) == layout && r.getLong(2) == 2L)
      val st = spark.sql(s"SELECT col_name, n_rows, n_nulls, ndv, min_str, max_str " +
        s"FROM snapcat.$t.stats ORDER BY col_name").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getString(4), x.getString(5))).toSeq
      assert(st == Seq(
        ("k", 4L, 0L, 4L, "1", "4"),
        ("v", 4L, 1L, 2L, "a", "b")), s"$layout: $st")
    }
  }
}
