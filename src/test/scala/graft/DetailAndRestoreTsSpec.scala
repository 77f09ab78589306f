package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{ManifestStore, SnapshotStore}

/** `<store>.detail` (DESCRIBE DETAIL, metadata-only) and
  * `CALL restore_ts` (RESTORE ... TIMESTAMP AS OF riding the
  * version-log checkpoint), plus the `.changes_cdf` streaming
  * composition with Trigger.AvailableNow. */
class DetailAndRestoreTsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_dr").toString
    spark.conf.set("spark.sql.catalog.drcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.drcat.root", r)
    r
  }

  private def buildChain(name: String, linked: Boolean): Unit = {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val d2 = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    val d3 = Seq((4L, "d")).toDF("k", "v")
    if (linked) {
      val st = new ManifestStore(spark, s"$root/$name", "k")
      st.write(v1, 1L, 2, commitTs = Some(1000L))
      st.mergeDelta(1L, 2L, d2, commitTs = Some(2000L))
      st.mergeDelta(2L, 3L, d3, commitTs = Some(3000L))
    } else {
      val st = new SnapshotStore(spark, s"$root/$name", "k")
      st.writeRangePartitioned(v1, 1L, 2, commitTs = Some(1000L))
      st.mergeDelta(1L, 2L, d2, commitTs = Some(2000L)): Unit
      st.mergeDelta(2L, 3L, d3, commitTs = Some(3000L)): Unit
    }
  }

  test(".detail serves one metadata row per table on both layouts") {
    buildChain("dt_snap", linked = false)
    buildChain("dt_linked", linked = true)
    for ((t, layout) <- Seq(("dt_snap", "snapshot"), ("dt_linked", "linked"))) {
      val r = spark.sql(s"SELECT * FROM drcat.$t.detail").head()
      assert(r.getAs[String]("layout") == layout, t)
      assert(r.getAs[String]("key_col") == "k", t)
      assert(r.getAs[String]("partitioned_by") == "", t)
      assert(r.getAs[Long]("n_constraints") == 0L, t)
      assert(r.getAs[Long]("n_versions") == 3L, t)
      assert(r.getAs[Long]("tip_version") == 3L, t)
      assert(r.getAs[Long]("tip_commit_ts") == 3000L, t)
      assert(r.getAs[Long]("tip_rows") == 4L, t)
    }
    // a temporal-partitioned table reports its transform spec
    spark.sql("CREATE TABLE drcat.dt_part (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES('key'='k')")
    assert(spark.sql("SELECT partitioned_by FROM drcat.dt_part.detail")
      .head().getString(0) == "days(ts)")
  }

  test("CALL restore_ts restores the version live at the timestamp (both layouts)") {
    buildChain("rt_snap", linked = false)
    buildChain("rt_linked", linked = true)
    for ((t, layout) <- Seq(("rt_snap", "snapshot"), ("rt_linked", "linked"))) {
      // 2500ms: v2 (committed at 2000) was live
      val r = spark.sql(s"CALL drcat.restore_ts('$t', '2500')").head()
      assert(r.getString(0) == layout && r.getLong(1) == 2L && r.getLong(2) == 4L, t)
      val content = spark.sql(s"SELECT k, v FROM drcat.$t").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
      assert(content == Set((1L, "a"), (2L, "b2"), (3L, "c")), s"$t restored tip")
      // history intact: v3 still reads
      assert(spark.sql(s"SELECT COUNT(*) FROM drcat.$t VERSION AS OF 3")
        .head().getLong(0) == 4L, t)
      // a pre-history timestamp fails loudly
      val e = intercept[Exception](
        spark.sql(s"CALL drcat.restore_ts('$t', '500')").collect())
      assert(e.getMessage.contains("no version"), s"$t: ${e.getMessage}")
    }
  }

  test(".changes_cdf streams; AvailableNow drains the CDF feed and terminates") {
    buildChain("cdf_stream", linked = true)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dr_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_dr_out").toString
    val q = spark.readStream.table("drcat.cdf_stream.changes_cdf")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow CDF drain did not terminate")
    val rows = spark.read.parquet(out).collect().map(r =>
      (r.getLong(r.fieldIndex("k")),
        if (r.isNullAt(r.fieldIndex("v"))) null else r.getString(r.fieldIndex("v")),
        r.getString(r.fieldIndex("change_type")),
        r.getLong(r.fieldIndex("_commit_version")))).toSet
    // commit 2's update arrives as a preimage/postimage PAIR
    assert(rows == Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (2L, "b", "update_preimage", 2L), (2L, "b2", "update_postimage", 2L),
      (3L, "c", "insert", 2L), (4L, "d", "insert", 3L)), rows)
  }
}
