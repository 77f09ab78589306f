package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConstraintViolationException, ManifestStore, SnapshotStore}

/** Write-time CHECK constraints on both store layouts — Delta's
  * contract: ADD CONSTRAINT scans the tip once (fails if existing rows
  * violate), then EVERY landing validates its new rows BEFORE any
  * version publishes; a row violates when the expression evaluates
  * FALSE, a NULL result passes (SQL standard — `c IS NOT NULL` is the
  * explicit NOT NULL spelling). Pinned history is never re-judged. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: Seq[(Long, Option[Double], Option[String])]) =
    t.toDF("k", "x", "tag")

  test("linked: constraints gate merge/write; NULL passes; rejected commits publish NOTHING") {
    val root = java.nio.file.Files.createTempDirectory("graft-ck-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.write(rows(Seq((1L, Some(10.0), Some("a")), (2L, Some(20.0), None))), 1L)
    st.addConstraint("x_pos", "x > 0")
    st.addConstraint("tag_short", "length(tag) <= 4") // NULL tag passes
    assert(st.constraints().map(_._1) == Seq("x_pos", "tag_short"))
    // a valid merge (including a NULL-evaluating row) passes
    st.mergeDelta(1L, 2L, rows(Seq((3L, Some(5.0), None)))): Unit
    // a violating merge is refused and publishes nothing
    val e = intercept[ConstraintViolationException] {
      st.mergeDelta(2L, 3L, rows(Seq((4L, Some(-1.0), Some("bad")))))
    }
    assert(e.getMessage.contains("x_pos") && e.getMessage.contains("\"k\":4"))
    assert(st.versions() == Seq(1L, 2L), "a rejected commit must not publish")
    // the other constraint fires independently
    val e2 = intercept[ConstraintViolationException] {
      st.mergeDelta(2L, 3L, rows(Seq((4L, Some(1.0), Some("toolong")))))
    }
    assert(e2.getMessage.contains("tag_short"))
    // dropping the constraint re-admits the rows
    st.dropConstraint("x_pos")
    st.mergeDelta(2L, 3L, rows(Seq((4L, Some(-1.0), Some("ok"))))): Unit
    assert(st.read(3L).count() == 4L)
  }

  test("linked: ADD CONSTRAINT scans existing rows; schema verbs refuse on a constrained column") {
    val root = java.nio.file.Files.createTempDirectory("graft-ck-add").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.write(rows(Seq((1L, Some(-5.0), Some("a")))), 1L)
    val e = intercept[ConstraintViolationException](st.addConstraint("x_pos", "x > 0"))
    assert(e.getMessage.contains("existing rows"))
    assert(st.constraints().isEmpty, "a failed ADD must record nothing")
    st.addConstraint("tag_ok", "length(tag) <= 8")
    val r = intercept[UnsupportedOperationException](
      st.renameColumn(1L, 2L, "tag", "label"))
    assert(r.getMessage.contains("tag_ok"))
    val d = intercept[UnsupportedOperationException](
      st.dropColumns(1L, 2L, Seq("tag")))
    assert(d.getMessage.contains("tag_ok"))
    st.dropConstraint("tag_ok")
    st.dropColumns(1L, 2L, Seq("tag")) // now fine
  }

  test("snapshot: the same contract on the dir-per-version layout") {
    val root = java.nio.file.Files.createTempDirectory("graft-ck-sn").toString
    val st = new SnapshotStore(spark, s"$root/t", "k")
    st.writeRangePartitioned(rows(Seq((1L, Some(10.0), Some("a")))), 1L, 2)
    st.addConstraint("x_pos", "x > 0")
    st.mergeDelta(1L, 2L, rows(Seq((2L, Some(1.0), None)))): Unit
    val e = intercept[ConstraintViolationException] {
      st.mergeDelta(2L, 3L, rows(Seq((3L, Some(0.0), None))))
    }
    assert(e.getMessage.contains("x_pos"))
    assert(st.versions() == Seq(1L, 2L))
    // write() is gated too
    val w = intercept[ConstraintViolationException] {
      st.write(rows(Seq((9L, Some(-2.0), None))), 3L)
    }
    assert(w.getMessage.contains("x_pos"))
  }

  test("SQL surface: CALL add_constraint gates INSERT/UPDATE; .constraints lists; drop re-admits") {
    val root = java.nio.file.Files.createTempDirectory("graft-ck-sql").toString
    org.apache.spark.sql.graft.GraftExtensions.register(spark) // UPDATE rewrite rule
    spark.conf.set("spark.sql.catalog.ckcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ckcat.root", root)
    for (layout <- Seq("linked", "snapshot")) {
      val t = s"ck_$layout"
      spark.sql(s"CREATE TABLE ckcat.$t (k BIGINT, x DOUBLE) " +
        s"TBLPROPERTIES('key'='k', 'layout'='$layout')")
      spark.sql(s"INSERT INTO ckcat.$t VALUES (1, 1.0), (2, 2.0)")
      val added = spark.sql(
        s"CALL ckcat.add_constraint('$t', 'x_pos', 'x > 0')").collect().head
      assert(added.getString(0) == layout && added.getLong(1) == 1L)
      assert(spark.sql(s"SELECT name, expr FROM ckcat.$t.constraints")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("x_pos", "x > 0")), layout)
      // violating INSERT refused; table unchanged
      val e = intercept[Exception](
        spark.sql(s"INSERT INTO ckcat.$t VALUES (3, -1.0)"))
      assert(e.getMessage.contains("x_pos"), s"$layout: ${e.getMessage}")
      assert(spark.sql(s"SELECT COUNT(*) FROM ckcat.$t").head().getLong(0) == 2L)
      // violating UPDATE refused too (rides the same mergeDelta)
      val u = intercept[Exception](
        spark.sql(s"UPDATE ckcat.$t SET x = -5.0 WHERE k = 1"))
      assert(u.getMessage.contains("x_pos"), s"$layout: ${u.getMessage}")
      spark.sql(s"CALL ckcat.drop_constraint('$t', 'x_pos')").collect(): Unit
      spark.sql(s"INSERT INTO ckcat.$t VALUES (3, -1.0)")
      assert(spark.sql(s"SELECT COUNT(*) FROM ckcat.$t").head().getLong(0) == 3L)
    }
  }
}
