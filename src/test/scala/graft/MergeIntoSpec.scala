package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{ManifestStore, SnapshotStore}

/** SQL `MERGE INTO` through SnapshotCatalog + GraftMergeStrategy: the
  * resolved MergeIntoTable executes through the store's own mergeDelta
  * on BOTH layouts — history immutable, clause semantics per the SQL
  * standard (first-clause-wins, cardinality rule), untranslatable
  * statements refused loudly. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val r = java.nio.file.Files.createTempDirectory("graft_merge").toString
    spark.conf.set("spark.sql.catalog.mcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.root", r)
    r
  }

  private def baseRows: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")

  private def freshSnap(name: String): SnapshotStore = {
    val st = new SnapshotStore(spark, s"$root/$name", "k")
    st.writeRangePartitioned(baseRows, 1L, 2)
    st
  }

  private def freshLinked(name: String): ManifestStore = {
    val st = new ManifestStore(spark, s"$root/$name", "k")
    st.write(baseRows, 1L, 2)
    st
  }

  private def contents(table: String, suffix: String = ""): Set[(Long, String, Double)] =
    spark.sql(s"SELECT k, name, v FROM mcat.$table $suffix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("full MERGE (delete + update + insert clauses) on both layouts; history immutable") {
    freshSnap("m_snap"); freshLinked("m_linked")
    Seq((2L, "B", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("m_src")
    for (t <- Seq("m_snap", "m_linked")) {
      spark.sql(
        s"""MERGE INTO mcat.$t t USING m_src s ON t.k = s.k
           |WHEN MATCHED AND s.k = 3 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(contents(t) == Set((1L, "a", 10.0), (2L, "B", 22.0), (4L, "d", 40.0)), t)
      assert(contents(t, "VERSION AS OF 1") ==
        Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)), s"$t history")
    }
  }

  test("WITH ... MERGE INTO: a CTE-nested merge still routes through the store hooks") {
    // the DML exclusion in V1StatsRelationRule must find the MERGE
    // target ANYWHERE in the tree — a WithCTE wrapper used to fall
    // through to convert(), severing GraftMergeStrategy's unwrapTable
    // lookup and failing the statement
    freshSnap("m_cte_snap"); freshLinked("m_cte_linked")
    for (t <- Seq("m_cte_snap", "m_cte_linked")) {
      spark.sql(
        s"""WITH src AS (SELECT 2L AS k, 'B' AS name, 22.0 AS v
           |            UNION ALL SELECT 4L, 'd', 40.0)
           |MERGE INTO mcat.$t t USING src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(contents(t) == Set((1L, "a", 10.0), (2L, "B", 22.0),
        (3L, "c", 30.0), (4L, "d", 40.0)), t)
    }
  }

  test("partial SET keeps unassigned columns; NOT MATCHED BY SOURCE update/delete") {
    freshSnap("m_partial")
    Seq((2L, 5.0), (4L, 9.0)).toDF("k", "bonus").createOrReplaceTempView("m_psrc")
    spark.sql(
      """MERGE INTO mcat.m_partial t USING m_psrc s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + s.bonus
        |WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = upper(t.name)""".stripMargin)
    // 2 updated in place (name kept), 3 deleted, 1 upper-cased
    assert(contents("m_partial") == Set((1L, "A", 10.0), (2L, "b", 25.0)))
  }

  test("first-clause-wins ordering among matched clauses") {
    freshLinked("m_order")
    Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("m_osrc")
    // k=1 satisfies BOTH conditions: the first (v := 100) must win
    spark.sql(
      """MERGE INTO mcat.m_order t USING m_osrc s ON t.k = s.k
        |WHEN MATCHED AND t.k <= 2 THEN UPDATE SET v = 100.0
        |WHEN MATCHED AND t.k = 1 THEN UPDATE SET v = -1.0""".stripMargin)
    assert(contents("m_order") ==
      Set((1L, "a", 100.0), (2L, "b", 100.0), (3L, "c", 30.0)))
  }

  test("cardinality violation (one target row, two matching source rows) refuses") {
    freshLinked("m_card")
    Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("m_dupsrc")
    val e = intercept[Exception](spark.sql(
      "MERGE INTO mcat.m_card t USING m_dupsrc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET *"))
    assert(e.getMessage.contains("cardinality"), e.getMessage)
    // duplicate UNMATCHED keys are SQL-legal: both insert
    Seq((7L, "x", 1.0), (7L, "y", 2.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("m_dupins")
    spark.sql("MERGE INTO mcat.m_card t USING m_dupins s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(contents("m_card").size == 5)
    // but an INSERT whose key collides with an EXISTING target key
    // refuses: the store's key-upsert would replace where SQL duplicates
    val e2 = intercept[Exception](spark.sql(
      "MERGE INTO mcat.m_card t USING m_dupsrc s ON t.k = s.k + 100 " +
        "WHEN NOT MATCHED THEN INSERT *"))
    assert(e2.getMessage.contains("collides"), e2.getMessage)
  }

  test("untranslatable statements refuse loudly: non-key ON, key reassignment, schema evolution") {
    freshSnap("m_refuse")
    Seq((2L, "B", 22.0)).toDF("k", "name", "v").createOrReplaceTempView("m_rsrc")
    val e1 = intercept[Exception](spark.sql(
      "MERGE INTO mcat.m_refuse t USING m_rsrc s ON t.v = s.v " +
        "WHEN MATCHED THEN UPDATE SET *"))
    assert(e1.getMessage.contains("key column"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "MERGE INTO mcat.m_refuse t USING m_rsrc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET k = s.k + 1"))
    assert(e2.getMessage.contains("identity"), e2.getMessage)
    // a same-shape WITH SCHEMA EVOLUTION is just a merge (no changes
    // to evolve) — it must succeed, not refuse
    spark.sql(
      "MERGE WITH SCHEMA EVOLUTION INTO mcat.m_refuse t USING m_rsrc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET *")
    assert(contents("m_refuse") == Set((1L, "a", 10.0), (2L, "B", 22.0), (3L, "c", 30.0)))
  }

  test("MERGE WITH SCHEMA EVOLUTION: source's new column evolves the target (both layouts); type changes keep refusing") {
    for ((t, mk) <- Seq(("m_evo_snap", () => freshSnap("m_evo_snap"): Unit),
        ("m_evo_linked", () => freshLinked("m_evo_linked"): Unit))) {
      mk()
      Seq((2L, "B", 22.0, 0.9), (4L, "d", 40.0, 0.4))
        .toDF("k", "name", "v", "score").createOrReplaceTempView("m_esrc")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO mcat.$t t USING m_esrc s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.sql(s"SELECT k, name, v, score FROM mcat.$t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toSet
      assert(got == Set((1L, "a", 10.0, null), (2L, "B", 22.0, 0.9),
        (3L, "c", 30.0, null), (4L, "d", 40.0, 0.4)), s"$t: $got")
      // pinned history keeps the narrow schema
      assert(!spark.sql(s"SELECT * FROM mcat.$t VERSION AS OF 1")
        .columns.contains("score"), t)
    }
    // a type CHANGE stays refused (schema evolution adds columns and
    // widens; it never reinterprets stored bytes)
    Seq((2L, "B", "not-a-double")).toDF("k", "name", "v")
      .createOrReplaceTempView("m_esrc_bad")
    val e = intercept[Exception](spark.sql(
      "MERGE WITH SCHEMA EVOLUTION INTO mcat.m_evo_linked t USING m_esrc_bad s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET *"))
    assert(e.getMessage != null)
  }

  test("MERGE onto an evolved tip: fills materialize, sidecar carries forward") {
    val st = freshSnap("m_evolved")
    // evolve via the store API: add `score` with fill=1.0 for old rows
    st.mergeDelta(1L, 2L, Seq((4L, "d", 40.0, 7.0)).toDF("k", "name", "v", "score"),
      fill = Map("score" -> 1.0))
    Seq((1L, "a9", 11.0, 9.0), (5L, "e", 50.0, 5.0)).toDF("k", "name", "v", "score")
      .createOrReplaceTempView("m_esrc")
    spark.sql(
      """MERGE INTO mcat.m_evolved t USING m_esrc s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT k, name, v, score FROM mcat.m_evolved").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSet
    // 2,3 carry the fill; 4 its explicit score; 1 updated; 5 inserted
    assert(got == Set((1L, "a9", 11.0, 9.0), (2L, "b", 20.0, 1.0),
      (3L, "c", 30.0, 1.0), (4L, "d", 40.0, 7.0), (5L, "e", 50.0, 5.0)))
  }

  test("SQL UPDATE on both layouts: partial SET, WHERE, history immutable") {
    freshSnap("u_snap"); freshLinked("u_linked")
    for (t <- Seq("u_snap", "u_linked")) {
      spark.sql(s"UPDATE mcat.$t SET v = v + 0.5 WHERE k >= 2")
      assert(contents(t) == Set((1L, "a", 10.0), (2L, "b", 20.5), (3L, "c", 30.5)), t)
      assert(contents(t, "VERSION AS OF 1") ==
        Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)), s"$t history")
    }
    // no WHERE = every row (the full-rewrite SQL asks for)
    spark.sql("UPDATE mcat.u_snap SET name = upper(name)")
    assert(contents("u_snap") == Set((1L, "A", 10.0), (2L, "B", 20.5), (3L, "C", 30.5)))
  }

  test("SQL UPDATE refusals: key reassignment; version-pinned target") {
    freshSnap("u_refuse")
    val e1 = intercept[Exception](
      spark.sql("UPDATE mcat.u_refuse SET k = k + 10 WHERE k = 1"))
    assert(e1.getMessage.contains("identity"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("UPDATE mcat.u_refuse VERSION AS OF 1 SET v = 0.0"))
    assert(e2.getMessage != null)
    // nothing landed
    assert(contents("u_refuse") == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("SQL INSERT INTO appends on both layouts; collisions and batch duplicates refuse") {
    freshSnap("i_snap"); freshLinked("i_linked")
    for (t <- Seq("i_snap", "i_linked")) {
      spark.sql(s"INSERT INTO mcat.$t VALUES (4, 'd', 40.0), (5, 'e', 50.0)")
      assert(contents(t) == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
        (4L, "d", 40.0), (5L, "e", 50.0)), t)
      assert(contents(t, "VERSION AS OF 1") ==
        Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)), s"$t history")
      // existing-key collision: the store would replace where SQL duplicates
      val e1 = intercept[Exception](
        spark.sql(s"INSERT INTO mcat.$t VALUES (1, 'dup', 0.0)"))
      assert(e1.getMessage.contains("identity"), e1.getMessage)
      // intra-batch duplicate keys collapse in a key-upsert: refuse
      val e2 = intercept[Exception](
        spark.sql(s"INSERT INTO mcat.$t VALUES (9, 'x', 1.0), (9, 'y', 2.0)"))
      assert(e2.getMessage.contains("duplicate"), e2.getMessage)
      // nothing landed from the refused statements
      assert(contents(t).size == 5, t)
    }
  }

  test("SQL INSERT OVERWRITE replaces the table in one version; history immutable") {
    freshSnap("o_snap"); freshLinked("o_linked")
    for (t <- Seq("o_snap", "o_linked")) {
      spark.sql(s"INSERT OVERWRITE mcat.$t VALUES (7, 'z', 70.0), (2, 'B', 22.0)")
      assert(contents(t) == Set((7L, "z", 70.0), (2L, "B", 22.0)), t)
      assert(contents(t, "VERSION AS OF 1") ==
        Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)), s"$t history")
    }
  }

  test("catalog DML on a stats-bearing linked store: the reconstructed handle derives stats from the manifest") {
    // the advice scenario: store built WITH statsCols; the catalog
    // hook reconstructs it with statsCols=Nil — version-to-version ops
    // must reproduce the manifest's min_/max_ columns anyway
    val st = new ManifestStore(spark, s"$root/m_stats", "k", Seq("v"))
    st.write(baseRows, 1L, 2)
    Seq((2L, "B", 22.0), (9L, "i", 90.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("m_ssrc")
    spark.sql(
      """MERGE INTO mcat.m_stats t USING m_ssrc s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("DELETE FROM mcat.m_stats WHERE v > 80.0")
    assert(contents("m_stats") ==
      Set((1L, "a", 10.0), (2L, "B", 22.0), (3L, "c", 30.0)))
    // the new tip's manifest still carries the v-stats columns, and
    // readWhere (which NEEDS them) keeps pruning on a stats handle
    val cols = st.manifest(3L).columns.toSet
    assert(cols.contains("min_v") && cols.contains("max_v"), cols)
    assert(st.readWhere(3L, "v", 20.0, 25.0).collect().map(_.getAs[Long]("k")).toSet
      == Set(2L))
  }
}
