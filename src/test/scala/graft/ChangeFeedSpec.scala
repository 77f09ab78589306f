package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{ManifestStore, SnapshotStore}

/** The catalog change feed: `<store>.changes` batch reads (full
  * history + bounded commit ranges), and the streaming sources —
  * `readStream.table(t.changes)` replaying a merge chain bit-for-bit
  * against the batch diffs, and the plain-table row-state stream with
  * its delete refusal. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_cf").toString
    spark.conf.set("spark.sql.catalog.cfcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.cfcat.root", r)
    r
  }

  /** v1 = {1:a, 2:b, 3:c}; v2 = upsert {2:b2, 4:d} + delete {3};
    * v3 = insert {5:e}. */
  private def buildChain(name: String, linked: Boolean): Unit = {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val d2 = Seq((2L, "b2"), (4L, "d")).toDF("k", "v")
    val del2 = Seq(3L).toDF("k")
    val d3 = Seq((5L, "e")).toDF("k", "v")
    if (linked) {
      val st = new ManifestStore(spark, s"$root/$name", "k")
      st.write(v1, 1L, 2, commitTs = Some(1000L))
      st.mergeDelta(1L, 2L, d2, Some(del2), commitTs = Some(2000L))
      st.mergeDelta(2L, 3L, d3, commitTs = Some(3000L))
    } else {
      val st = new SnapshotStore(spark, s"$root/$name", "k")
      st.writeRangePartitioned(v1, 1L, 2, commitTs = Some(1000L))
      st.mergeDelta(1L, 2L, d2, Some(del2), commitTs = Some(2000L)): Unit
      st.mergeDelta(2L, 3L, d3, commitTs = Some(3000L)): Unit
    }
  }

  private def rows(df: DataFrame): Set[(Long, String, String, Long)] =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("k")),
        if (r.isNullAt(r.fieldIndex("v"))) null else r.getString(r.fieldIndex("v")),
        r.getString(r.fieldIndex("change_type")),
        r.getLong(r.fieldIndex("_commit_version")))
    }.toSet

  private val commit1 = Set[(Long, String, String, Long)](
    (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 1L))
  private val commit2 = Set[(Long, String, String, Long)](
    (2L, "b2", "update", 2L), (4L, "d", "insert", 2L), (3L, null, "delete", 2L))
  private val commit3 = Set[(Long, String, String, Long)]((5L, "e", "insert", 3L))

  test("batch .changes: full history and bounded ranges, identical on both layouts") {
    buildChain("cf_snap", linked = false)
    buildChain("cf_linked", linked = true)
    for (t <- Seq("cf_snap", "cf_linked")) {
      assert(rows(spark.sql(s"SELECT * FROM cfcat.$t.changes"))
        == commit1 ++ commit2 ++ commit3, s"$t full history")
      assert(rows(spark.sql(s"SELECT * FROM cfcat.$t.changes VERSION AS OF '2..3'"))
        == commit2 ++ commit3, s"$t range 2..3")
      assert(rows(spark.sql(s"SELECT * FROM cfcat.$t.changes VERSION AS OF '2..2'"))
        == commit2, s"$t range 2..2")
    }
  }

  test("bounded range over a pruned predecessor fails loudly; stream bootstrap still replays") {
    buildChain("cf_pruned", linked = true)
    val st = new ManifestStore(spark, s"$root/cf_pruned", "k")
    st.prune(keep = Seq(2L, 3L)): Unit // v1 gone: v2 has no retained predecessor
    // explicit `a..b` range: Delta's table_changes contract — fail
    // instead of silently reclassifying older commits' rows as inserts
    val e = intercept[Exception](
      spark.sql("SELECT * FROM cfcat.cf_pruned.changes VERSION AS OF '2..3'").collect())
    assert(e.getMessage.contains("pruned"), s"wrong error: ${e.getMessage}")
    // a range whose start still has its predecessor is unaffected
    assert(rows(spark.sql(
      "SELECT * FROM cfcat.cf_pruned.changes VERSION AS OF '3..3'")) == commit3)
    // the STREAM bootstrap keeps initial-snapshot semantics: v2 full
    // state as inserts, then v3's exact diff
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cfpr_ck").toString
    val q = spark.readStream.table("cfcat.cf_pruned.changes")
      .writeStream.format("memory").queryName("cf_pruned_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(rows(spark.table("cf_pruned_stream")) ==
        Set((1L, "a", "insert", 2L), (2L, "b2", "insert", 2L),
          (4L, "d", "insert", 2L)) ++ commit3)
    } finally q.stop()
  }

  test("readStream.table(t.changes) replays the merge chain bit-for-bit vs the batch feed") {
    buildChain("cfs_linked", linked = true)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ck").toString
    val q = spark.readStream.table("cfcat.cfs_linked.changes")
      .writeStream.format("memory").queryName("cf_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // the replay == the batch feed over the same commits, bit-for-bit
      assert(rows(spark.table("cf_stream")) == commit1 ++ commit2 ++ commit3)
      // a commit landing mid-stream arrives as its own per-version diff
      val st = new ManifestStore(spark, s"$root/cfs_linked", "k")
      st.mergeDelta(3L, 4L, Seq((1L, "a4")).toDF("k", "v"), commitTs = Some(4000L))
      q.processAllAvailable()
      assert(rows(spark.table("cf_stream"))
        == commit1 ++ commit2 ++ commit3 + ((1L, "a4", "update", 4L)))
      assert(rows(spark.table("cf_stream"))
        == rows(spark.sql("SELECT * FROM cfcat.cfs_linked.changes VERSION AS OF '1..4'")))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains to the tip pinned at start, terminates, and follows on restart") {
    buildChain("cfa_linked", linked = true)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ckan").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cf_anout").toString
    // paced catch-up: one commit per batch — AvailableNow must still
    // reach the pinned tip through admission control, THEN terminate.
    // foreachBatch-append sink: it supports checkpoint RECOVERY, which
    // the restart half of the contract needs (memory sink does not).
    def drain(): Int = {
      val batches = new java.util.concurrent.atomic.AtomicInteger
      val q = spark.readStream.option("maxVersionsPerTrigger", "1")
        .table("cfcat.cfa_linked.changes")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          batches.incrementAndGet()
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow run did not self-terminate")
      batches.get()
    }
    val b1 = drain()
    assert(b1 >= 3, s"pacing composes: 3 commits at 1/trigger need >=3 batches, got $b1")
    assert(rows(spark.read.parquet(out)) == commit1 ++ commit2 ++ commit3,
      "catch-up lands exactly the commits that existed at start")
    // commits landing AFTER the pin wait for the next run
    val st = new ManifestStore(spark, s"$root/cfa_linked", "k")
    st.mergeDelta(3L, 4L, Seq((1L, "a4")).toDF("k", "v"), commitTs = Some(4000L))
    drain()
    assert(rows(spark.read.parquet(out))
      == commit1 ++ commit2 ++ commit3 + ((1L, "a4", "update", 4L)),
      "restart resumes from the checkpoint and drains ONLY the later commit")
  }

  test("plain-table stream serves row state per commit; startingVersion bounds the replay") {
    // chain without deletes: v1 then an upsert commit
    val st = new ManifestStore(spark, s"$root/cfp_linked", "k")
    st.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L, 2, commitTs = Some(1000L))
    st.mergeDelta(1L, 2L, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"),
      commitTs = Some(2000L))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ck2").toString
    val q = spark.readStream.table("cfcat.cfp_linked")
      .writeStream.format("memory").queryName("cf_rows")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cf_rows").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // v1 state as the bootstrap inserts + commit 2's new row state
      assert(got == Set((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")))
    } finally q.stop()
    // startingVersion skips the bootstrap
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cf_ck3").toString
    val q2 = spark.readStream.option("startingVersion", "2")
      .table("cfcat.cfp_linked")
      .writeStream.format("memory").queryName("cf_rows2")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("cf_rows2").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        == Set((2L, "b2"), (3L, "c")))
    } finally q2.stop()
  }

  test("plain-table stream refuses a delete commit loudly; ignoreDeletes opts out") {
    buildChain("cfd_snap", linked = false) // commit 2 deletes key 3
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ck4").toString
    val q = spark.readStream.table("cfcat.cfd_snap")
      .writeStream.format("memory").queryName("cf_del")
      .option("checkpointLocation", ckpt).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.awaitTermination()
    }
    assert(e.getMessage.contains("DELETE") || e.getMessage.contains("ignoreDeletes"),
      e.getMessage)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cf_ck5").toString
    val q2 = spark.readStream.option("ignoreDeletes", "true")
      .table("cfcat.cfd_snap")
      .writeStream.format("memory").queryName("cf_del2")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("cf_del2").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        == Set((1L, "a"), (2L, "b"), (3L, "c"), (2L, "b2"), (4L, "d"), (5L, "e")))
    } finally q2.stop()
  }

  test("batch tip reads through the stream-capable wrapper keep native pushdown") {
    buildChain("cfw_snap", linked = false)
    val plan = spark.sql("SELECT k FROM cfcat.cfw_snap WHERE k >= 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThanOrEqual(k,2)]")
      || plan.contains("GreaterThanOrEqual(k,2)"), s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<k:bigint>"), s"column pruning lost:\n$plan")
  }

  test("timestamp-bounded feeds: ISO ranges, since-ts reads, boundary semantics") {
    buildChain("cft_linked", linked = true)
    // commits at 1000/2000/3000 ms epoch (UTC session tz in specs)
    // bounded ISO range selects commits with ts1 <= commit_ts <= ts2
    assert(rows(spark.sql("SELECT * FROM cfcat.cft_linked.changes " +
      "VERSION AS OF '1970-01-01T00:00:02..1970-01-01T00:00:03'"))
      == commit2 ++ commit3, "inclusive [2s, 3s] must select commits 2 and 3")
    // boundaries are INCLUSIVE at both ends; a window between commits is empty
    assert(spark.sql("SELECT * FROM cfcat.cft_linked.changes " +
      "VERSION AS OF '1970-01-01T00:00:02.001..1970-01-01T00:00:02.999'")
      .count() == 0)
    // single TIMESTAMP AS OF = "changes SINCE ts" (at-or-after through tip)
    assert(rows(spark.sql("SELECT * FROM cfcat.cft_linked.changes " +
      "TIMESTAMP AS OF '1970-01-01 00:00:02'")) == commit2 ++ commit3)
    // a since-ts read past the tip is an empty feed, not an error
    assert(spark.sql("SELECT * FROM cfcat.cft_linked.changes " +
      "TIMESTAMP AS OF '1970-01-01 00:01:00'").count() == 0)
    // pre-history fail-fast: prune v1, then a window reaching back to
    // v2 (whose predecessor is gone) refuses through the pruned-
    // predecessor contract
    val st = new ManifestStore(spark, s"$root/cft_linked", "k")
    st.prune(keep = Seq(2L, 3L)): Unit
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM cfcat.cft_linked.changes " +
        "VERSION AS OF '1970-01-01T00:00:01..1970-01-01T00:00:03'").collect())
    assert(e.getMessage.contains("pruned"))
  }

  test("streaming startingTimestamp resolves at-or-after; exclusive with startingVersion") {
    buildChain("cfts_linked", linked = true)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ckts").toString
    val q = spark.readStream
      .option("startingTimestamp", "1970-01-01T00:00:02")
      .table("cfcat.cfts_linked.changes")
      .writeStream.format("memory").queryName("cf_since_ts")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(rows(spark.table("cf_since_ts")) == commit2 ++ commit3,
        "at-or-after 2s must replay commits 2 and 3 only")
    } finally q.stop()
    intercept[Exception] {
      spark.readStream
        .option("startingTimestamp", "2000").option("startingVersion", "2")
        .table("cfcat.cfts_linked.changes")
        .writeStream.format("memory").queryName("cf_both")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_cf_ckb").toString)
        .start().processAllAvailable()
    }
  }

  test("maxBytesPerTrigger paces by commit bytes; composes with maxVersionsPerTrigger (min wins)") {
    buildChain("cfb_linked", linked = true)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ckby").toString
    // every commit is > 1 byte, so a 1-byte budget admits exactly one
    // commit per batch — same pacing the version cap would give
    val q = spark.readStream
      .option("maxBytesPerTrigger", "1")
      .option("maxVersionsPerTrigger", "10") // looser: bytes must win
      .table("cfcat.cfb_linked.changes")
      .writeStream.format("memory").queryName("cf_bytes")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(rows(spark.table("cf_bytes")) == commit1 ++ commit2 ++ commit3,
        "byte pacing must not change content")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3, s"expected >=3 byte-paced batches, saw $dataBatches")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger paces the replay one commit per batch; content unchanged") {
    buildChain("cfr_linked", linked = true)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ck3").toString
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("cfcat.cfr_linked.changes")
      .writeStream.format("memory").queryName("cf_paced")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // same feed, arriving as one batch PER COMMIT instead of one
      // catch-up batch: 3 commits -> >= 3 data-bearing micro-batches
      assert(rows(spark.table("cf_paced")) == commit1 ++ commit2 ++ commit3)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3, s"expected >=3 paced batches, saw $dataBatches")
    } finally q.stop()
  }

  test("LIVE streaming replica: readStream(src.changes) → linkedMergeStream(dst) converges and follows") {
    root: Unit
    buildChain("live_src", linked = true)
    val src = new ManifestStore(spark, s"$root/live_src", "k")
    val dst = new ManifestStore(spark, s"$root/live_dst", "k")
    dst.write(src.read(1L), 1L, 2) // replica seeded at the source's v1
    val ckpt = java.nio.file.Files.createTempDirectory("graft_live_ck").toString
    val feed = spark.readStream.option("startingVersion", "2")
      .table("cfcat.live_src.changes")
    val q = graft.streaming.StreamOps.linkedMergeStream(
      feed, dst, "k", ckpt, seqCol = Some("_commit_version"))
    def content(st: ManifestStore) = st.read(st.latestVersion().get)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    try {
      q.processAllAvailable()
      assert(content(dst) == content(src),
        "the replica must converge to the source tip")
      // a LIVE commit on the source replicates on the next trigger
      src.mergeDelta(3L, 4L, Seq((6L, "f")).toDF("k", "v"), Some(Seq(1L).toDF("k")))
      q.processAllAvailable()
      assert(content(dst) == content(src),
        "a post-start source commit must flow through")
      assert(content(dst) ==
        Set((2L, "b2"), (4L, "d"), (5L, "e"), (6L, "f")))
    } finally q.stop()
  }

  test("STREAMING materialized view: readStream(src.changes_cdf) → maintainAggregateStream converges and follows") {
    root: Unit
    // source: keyed rows with a value; aggregate MV: per-(k%3) sums
    val src = new ManifestStore(spark, s"$root/mv_src", "k")
    src.write((1L to 30L).map(i => (i, i * 1.0)).toDF("k", "x"), 1L, 2,
      commitTs = Some(1000L))
    src.mergeDeltaMor(1L, 2L,
      (1L to 30L).filter(_ % 5 == 0).map(i => (i, i * 1.0 + 100)).toDF("k", "x"),
      commitTs = Some(2000L)): Unit
    src.mergeDelta(2L, 3L, (31L to 40L).map(i => (i, i * 1.0)).toDF("k", "x"),
      Some(Seq(7L, 14L).toDF("k")), commitTs = Some(3000L)): Unit
    def recompute(v: Long) = src.read(v).withColumn("g",
      org.apache.spark.sql.functions.col("k") % 3)
      .groupBy("g").agg(org.apache.spark.sql.functions.sum("x").as("sum_x"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_rows"))
    val mv = new ManifestStore(spark, s"$root/mv_agg", "g")
    mv.write(recompute(1L), 1L, 1) // seeded at the source's v1
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ck").toString
    val feed = spark.readStream.option("startingVersion", "2")
      .table("cfcat.mv_src.changes_cdf")
      .withColumn("g", org.apache.spark.sql.functions.col("k") % 3)
    val q = graft.streaming.StreamOps.maintainAggregateStream(
      feed, mv, "g", Map("sum_x" -> "x"), ckpt)
    def agg(df: DataFrame) = df.select("g", "sum_x", "n_rows").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100) / 100.0,
        r.getLong(2))).toSet
    try {
      q.processAllAvailable()
      assert(agg(mv.read(mv.latestVersion().get)) == agg(recompute(3L)),
        "the MV must converge to the recomputed aggregate")
      // a LIVE source commit (incl. a group-emptying delete) follows
      val g0keys = src.read(3L).filter(
        org.apache.spark.sql.functions.col("k") % 3 === 0).select("k")
      src.mergeDelta(3L, 4L, Seq((41L, 41.0)).toDF("k", "x"), Some(g0keys),
        commitTs = Some(4000L)): Unit
      q.processAllAvailable()
      val got = agg(mv.read(mv.latestVersion().get))
      assert(got == agg(recompute(4L)), s"live follow: $got")
      assert(!got.exists(_._1 == 0L), "the emptied group must drop from the MV")
    } finally q.stop()
  }

  test("applyChanges: net-effect replication — replica == source tip; churn keys compress right") {
    root: Unit
    buildChain("apply_src", linked = true)
    val src = new ManifestStore(spark, s"$root/apply_src", "k")
    // churn on top: k=5 deleted at v4, re-inserted at v5; k=6 inserted
    // at v4 then deleted at v5 (must NET to: 5 present, 6 absent)
    src.mergeDelta(3L, 4L, Seq((6L, "f")).toDF("k", "v"), Some(Seq(5L).toDF("k")))
    src.mergeDelta(4L, 5L, Seq((5L, "e2")).toDF("k", "v"), Some(Seq(6L).toDF("k")))
    val dst = new ManifestStore(spark, s"$root/apply_dst", "k")
    dst.write(src.read(1L), 1L, 2)
    val feed = spark.sql("SELECT * FROM cfcat.apply_src.changes VERSION AS OF '2..5'")
    val (ups, dels) = graft.operators.Snapshot.applyChanges(feed, "k")
    dst.mergeDelta(1L, 2L, ups, dels): Unit
    def content(df: DataFrame) = df.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(content(dst.read(2L)) == content(src.read(5L)))
    assert(content(dst.read(2L)) ==
      Set((1L, "a"), (2L, "b2"), (4L, "d"), (5L, "e2")))
    // the net effect really compressed: one merge applied 4 commits
    assert(dst.versions() == Seq(1L, 2L))
  }

  /** One commit = mergeDeltaMor upsert {2:b2, 4:d} + delete {3} over
    * v1 = {1:a, 2:b, 3:c}; returns (diff(1,2), diffCdf(1,2)). */
  private def morChain(name: String, linked: Boolean): (DataFrame, DataFrame) = {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val d2 = Seq((2L, "b2"), (4L, "d")).toDF("k", "v")
    val del2 = Seq(3L).toDF("k")
    if (linked) {
      val st = new ManifestStore(spark, s"$root/$name", "k")
      st.write(v1, 1L, 2, commitTs = Some(1000L))
      st.mergeDeltaMor(1L, 2L, d2, Some(del2), commitTs = Some(2000L)): Unit
      (st.diff(1L, 2L), st.diffCdf(1L, 2L))
    } else {
      val st = new SnapshotStore(spark, s"$root/$name", "k")
      st.writeRangePartitioned(v1, 1L, 2, commitTs = Some(1000L))
      st.mergeDeltaMor(1L, 2L, d2, Some(del2), commitTs = Some(2000L)): Unit
      (st.diff(1L, 2L), st.diffCdf(1L, 2L))
    }
  }

  private def kct(df: DataFrame): Set[(Long, String, String)] =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("k")),
        if (r.isNullAt(r.fieldIndex("v"))) null else r.getString(r.fieldIndex("v")),
        r.getString(r.fieldIndex("change_type")))
    }.toSet

  test("a MoR mask-and-land upsert diffs as ONE update, never an insert+delete pair") {
    for ((name, linked) <- Seq(("cfm_snap", false), ("cfm_linked", true))) {
      val (d, cdf) = morChain(name, linked)
      // plain feed: k=2 is exactly one 'update' row with the NEW value;
      // the masked old position must NOT surface as a same-commit delete
      val plain = kct(d)
      assert(plain.filter(_._1 == 2L) == Set((2L, "b2", "update")), s"$name: $plain")
      assert(plain.filter(_._1 == 4L) == Set((4L, "d", "insert")), s"$name inserts")
      assert(plain.count(_._3 == "delete") == 1 &&
        plain.exists(t => t._1 == 3L && t._3 == "delete"), s"$name deletes")
      // CDF shape: the update arrives as an old-value/new-value pair
      val pairs = kct(cdf)
      assert(pairs.filter(_._1 == 2L) ==
        Set((2L, "b", "update_preimage"), (2L, "b2", "update_postimage")),
        s"$name cdf: $pairs")
      assert(pairs.filter(_._1 == 4L) == Set((4L, "d", "insert")), s"$name cdf insert")
      // Delta's CDF contract: the delete row carries the DELETED
      // row's values (the plain feed serves key-only deletes)
      assert(pairs.filter(_._1 == 3L) == Set((3L, "c", "delete")), s"$name cdf delete")
    }
  }

  test("updateWhere(mor) diffs as updates; applyChanges replicates a CDF feed") {
    val st = new ManifestStore(spark, s"$root/cfm_upd", "k")
    st.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), 1L, 2,
      commitTs = Some(1000L))
    st.updateWhere(1L, 2L, org.apache.spark.sql.functions.col("k") >= 2L,
      Map("v" -> org.apache.spark.sql.functions.upper(
        org.apache.spark.sql.functions.col("v"))), mode = "mor"): Unit
    assert(kct(st.diff(1L, 2L)) ==
      Set((2L, "B", "update"), (3L, "C", "update")))
    assert(kct(st.diffCdf(1L, 2L)) == Set(
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage"),
      (3L, "c", "update_preimage"), (3L, "C", "update_postimage")))
    // the catalog's .changes_cdf serves the same rows, version-stamped,
    // and applyChanges applies the POSTIMAGE (preimages never apply)
    val feed = spark.sql("SELECT * FROM cfcat.cfm_upd.changes_cdf VERSION AS OF '2..2'")
    val (ups, dels) = graft.operators.Snapshot.applyChanges(feed, "k")
    assert(dels.isEmpty)
    assert(ups.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((2L, "B"), (3L, "C")))
  }

  test("rename → mergeDeltaMor: CDF delete/preimage rows carry REAL values for the mapped column") {
    // the r14 advisor's medium finding: dvDeletesBetween pinned the
    // LOGICAL schema over physical-named files, so after a RENAME the
    // feed's delete rows and DV-sourced update_preimage rows carried
    // NULL for the mapped column — violating the CDF contract that
    // delete rows carry the deleted row's values.
    val st = new ManifestStore(spark, s"$root/cfm_ren", "k")
    st.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "w"), 1L, 2,
      commitTs = Some(1000L))
    st.renameColumn(1L, 2L, "w", "v")
    st.mergeDeltaMor(2L, 3L, Seq((2L, "b2"), (4L, "d")).toDF("k", "v"),
      deleteKeys = Some(Seq(3L).toDF("k")), commitTs = Some(3000L)): Unit
    // plain feed: the masked-then-relanded key is ONE update; the
    // genuine delete carries the old row's CONTENT under the new name
    assert(kct(st.diff(2L, 3L)) ==
      Set((2L, "b2", "update"), (3L, "c", "delete"), (4L, "d", "insert")))
    val pairs = kct(st.diffCdf(2L, 3L))
    assert(pairs == Set(
      (2L, "b", "update_preimage"), (2L, "b2", "update_postimage"),
      (3L, "c", "delete"), (4L, "d", "insert")), pairs.toString)
  }

  test("incremental SUM maintained from the CDF feed equals the recomputed aggregate") {
    val st = new ManifestStore(spark, s"$root/cfm_sum", "k")
    val v1 = (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "x")
    st.write(v1, 1L, 4, commitTs = Some(1000L))
    // update-heavy chain: MoR reprice of k%3, CoW reprice of k%4 +
    // fresh inserts — every shape the CDF feed distinguishes
    st.mergeDeltaMor(1L, 2L,
      (1L to 50L).filter(_ % 3 == 0).map(i => (i, i * 1.0 + 5)).toDF("k", "x"),
      commitTs = Some(2000L)): Unit
    st.mergeDelta(2L, 3L,
      ((1L to 50L).filter(_ % 4 == 0).map(i => (i, i * 1.0 + 7)) ++
        (51L to 60L).map(i => (i, i * 1.0))).toDF("k", "x"),
      commitTs = Some(3000L)): Unit
    // a delete commit too: CDF delete rows carry the deleted VALUES,
    // so the incremental sum subtracts them without any extra read
    st.mergeDelta(3L, 4L, Seq((61L, 61.0)).toDF("k", "x"),
      Some(Seq(10L, 20L).toDF("k")), commitTs = Some(4000L)): Unit
    val feed = spark.sql("SELECT * FROM cfcat.cfm_sum.changes_cdf VERSION AS OF '2..4'")
    // the FIRST-CLASS operator: per-group (k % 7) sums maintained from
    // the feed alone — groups appear (fresh inserts), shrink
    // (deletes), and reprice without a base-table rescan
    import org.apache.spark.sql.functions.{sum, count}
    def bucketed(df: DataFrame) = df.withColumn("g",
      org.apache.spark.sql.functions.col("k") % 7)
    val baseAgg = bucketed(v1).groupBy("g")
      .agg(sum("x").as("sum_x"), count(org.apache.spark.sql.functions.lit(1)).as("n_rows"))
    val maintained = graft.operators.Snapshot.maintainAggregate(
      baseAgg, bucketed(feed), Seq("g"), Map("sum_x" -> "x"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100) / 100.0,
        r.getLong(2))).toSet
    val recomputed = bucketed(st.read(4L)).groupBy("g")
      .agg(sum("x").as("sum_x"), count(org.apache.spark.sql.functions.lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100) / 100.0,
        r.getLong(2))).toSet
    assert(maintained == recomputed, s"maintained $maintained != recomputed $recomputed")
    // a plain (non-CDF) feed refuses: 'update' rows cannot retract.
    // The check rides INSIDE the delta aggregation (raise_error on the
    // first unknown change_type) — no extra validation pass over the
    // feed — so it surfaces at action time as a task failure
    val plain = spark.sql("SELECT * FROM cfcat.cfm_sum.changes VERSION AS OF '2..4'")
    val e = intercept[Exception](
      graft.operators.Snapshot.maintainAggregate(
        baseAgg, bucketed(plain), Seq("g"), Map("sum_x" -> "x")).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("CDF"), msgs)
    // a group that empties DROPS: delete every k%7==6 key left at v4
    val allKeys = st.read(4L).filter(org.apache.spark.sql.functions.col("k") % 7 === 6)
      .select("k")
    st.mergeDelta(4L, 5L, Seq((63L, 63.0)).toDF("k", "x"), Some(allKeys),
      commitTs = Some(5000L)): Unit
    val feed5 = spark.sql("SELECT * FROM cfcat.cfm_sum.changes_cdf VERSION AS OF '5..5'")
    val m5 = graft.operators.Snapshot.maintainAggregate(
      graft.operators.Snapshot.maintainAggregate(
        baseAgg, bucketed(feed), Seq("g"), Map("sum_x" -> "x")),
      bucketed(feed5), Seq("g"), Map("sum_x" -> "x"))
    assert(m5.filter(org.apache.spark.sql.functions.col("g") === 6L).count() == 0,
      "emptied group must drop")
    val rec5 = bucketed(st.read(5L)).groupBy("g")
      .agg(sum("x").as("sum_x"), count(org.apache.spark.sql.functions.lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100) / 100.0,
        r.getLong(2))).toSet
    assert(m5.collect().map(r => (r.getLong(0),
      math.round(r.getDouble(1) * 100) / 100.0, r.getLong(2))).toSet == rec5)
  }

  test("maintainAggregate preserves the seed schema's types and evaluates the feed ONCE") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DecimalType, LongType}
    // long + decimal sum columns: the maintained output must keep the
    // SEED's declared types (a double drift would abort
    // maintainAggregateStream's first micro-batch on mergeDelta's
    // type-change guard)
    val base = Seq((0L, 10L, "1.50", 2L), (1L, 20L, "2.25", 3L))
      .toDF("g", "sum_q", "sum_p", "n_rows")
      .withColumn("sum_p", col("sum_p").cast("decimal(12,2)"))
    val raw = Seq(
      (0L, 5L, "1.25", "insert"),
      (0L, 2L, "0.25", "update_preimage"),
      (0L, 3L, "0.75", "update_postimage"),
      (1L, 20L, "2.25", "delete"))
      .toDF("g", "q", "p", "change_type")
      .withColumn("p", col("p").cast("decimal(12,2)"))
    // count partition visits: the shape check rides inside the one
    // delta aggregation, so maintenance = exactly one pass (the old
    // eager limit(1).count() validation scanned the feed twice)
    val acc = spark.sparkContext.longAccumulator("feed_partition_visits")
    val rdd = raw.rdd.mapPartitions { it => acc.add(1L); it }
    val nParts = rdd.getNumPartitions
    val feed = spark.createDataFrame(rdd, raw.schema)
    val m = graft.operators.Snapshot.maintainAggregate(
      base, feed, Seq("g"), Map("sum_q" -> "q", "sum_p" -> "p"))
    assert(m.schema("sum_q").dataType == LongType, m.schema.treeString)
    assert(m.schema("sum_p").dataType == DecimalType(12, 2), m.schema.treeString)
    assert(m.schema("n_rows").dataType == LongType, m.schema.treeString)
    // output column order: groupCols ++ sums.keys.sorted :+ countCol
    val got = m.collect().map(r => (r.getLong(0),
      r.getDecimal(1).toPlainString, r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, "3.25", 16L, 3L), (1L, "0.00", 0L, 2L)), got.toString)
    assert(acc.value == nParts,
      s"feed saw ${acc.value} partition visits, expected $nParts (one pass)")
  }

  test("maintainAggregateStream refuses a store whose key is not the group column") {
    root: Unit
    val st = new ManifestStore(spark, s"$root/mv_wrongkey", "k")
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamOps.maintainAggregateStream(
        spark.readStream.format("rate").load(), st, "g",
        Map("sum_x" -> "x"), "/tmp/never-used-ck"))
    assert(e.getMessage.contains("keyed on 'k'"), e.getMessage)
  }

  test(".changes predicate pushdown: key bounds open an envelope-pruned file subset; content == post-filtering; _commit_version narrows the walk") {
    import org.apache.spark.sql.functions.col
    // 8 key-range files per landed version; merges touch LOW and HIGH
    // key bands so exclusive files spread across the key domain
    val name = "cf_push"
    val st = new ManifestStore(spark, s"$root/$name", "k")
    st.write((1L to 400L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, 8,
      commitTs = Some(1000L))
    st.mergeDelta(1L, 2L, Seq((5L, "u5"), (395L, "u395")).toDF("k", "v"),
      commitTs = Some(2000L))
    st.mergeDelta(2L, 3L, Seq((10L, "u10")).toDF("k", "v"),
      Some(Seq(20L).toDF("k")), commitTs = Some(3000L))
    // 1) semantics: diffKeyRange ≡ diff().filter(key in range), incl.
    // an update+delete commit
    for ((a, b) <- Seq((1L, 2L), (2L, 3L))) {
      val full = st.diff(a, b).filter(col("k").between(1L, 50L))
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      val ranged = st.diffKeyRange(a, b, 1L, 50L)
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(ranged == full, s"($a,$b): $ranged vs $full")
    }
    def scanned(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(_.split('/').last).toSet
    // 2) the ranged diff opens a STRICT subset of the full diff's
    // commit files: the low-band range must not open the high-band
    // exclusive file the 395-update rewrote
    val fullFiles = scanned(st.diff(1L, 2L))
    val rangedFiles = scanned(st.diffKeyRange(1L, 2L, 1L, 50L))
    assert(rangedFiles.subsetOf(fullFiles),
      s"ranged opened non-diff files: ${rangedFiles diff fullFiles}")
    assert(rangedFiles.size < fullFiles.size,
      s"no pruning: $rangedFiles vs $fullFiles")
    // 3) SQL: the key predicate reaches the V1 relation (PushedFilters
    // in the scan node) and the result equals post-filtering. The
    // plan-display assert needs the UNSWAPPED V1ScanWrapper route —
    // a prior suite may have installed V1StatsRelationRule in the
    // shared session's extraOptimizations, whose LogicalRelation swap
    // hides the pushed-filter metadata from the display (the pushed
    // bounds are baked into the relation either way — the content
    // asserts prove them) — so pin the display deterministically
    val savedOpts = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try {
      val planStr = spark.sql(
          s"SELECT * FROM cfcat.$name.changes WHERE k BETWEEN 1 AND 50")
        .queryExecution.executedPlan.toString
      assert(planStr.contains("PushedFilters") &&
        planStr.contains("GreaterThanOrEqual(k,1)"), planStr.take(2000))
    } finally spark.experimental.extraOptimizations = savedOpts
    val sqlRanged = spark.sql(
      s"SELECT * FROM cfcat.$name.changes WHERE k BETWEEN 1 AND 50")
    val sqlFull = spark.sql(s"SELECT * FROM cfcat.$name.changes")
      .filter(col("k").between(1L, 50L))
    assert(sqlRanged.collect().map(_.toString).sorted.toSeq ==
      sqlFull.collect().map(_.toString).sorted.toSeq)
    // 4) _commit_version bounds narrow the version walk and match the
    // explicit bounded-range read
    val byFilter = spark.sql(
      s"SELECT * FROM cfcat.$name.changes WHERE _commit_version = 2")
    val bounded = spark.sql(
      s"SELECT * FROM cfcat.$name.changes VERSION AS OF '2..2'")
    assert(byFilter.collect().map(_.toString).sorted.toSeq ==
      bounded.collect().map(_.toString).sorted.toSeq)
    assert(byFilter.collect().nonEmpty)
    // 5) the CDF-shaped feed pushes the same bounds: ranged diffCdf ≡
    // post-filtering (update pre/postimage pairs + valued deletes
    // intact), and the SQL .changes_cdf read matches
    for ((a, b) <- Seq((1L, 2L), (2L, 3L))) {
      val full = st.diffCdf(a, b).filter(col("k").between(1L, 50L))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(r.fieldIndex("change_type")))).toSet
      val ranged = st.diffCdfKeyRange(a, b, 1L, 50L)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(r.fieldIndex("change_type")))).toSet
      assert(ranged == full, s"cdf ($a,$b): $ranged vs $full")
    }
    val cdfRanged = spark.sql(
      s"SELECT * FROM cfcat.$name.changes_cdf WHERE k BETWEEN 1 AND 50")
    val cdfFull = spark.sql(s"SELECT * FROM cfcat.$name.changes_cdf")
      .filter(col("k").between(1L, 50L))
    assert(cdfRanged.collect().map(_.toString).sorted.toSeq ==
      cdfFull.collect().map(_.toString).sorted.toSeq)
    assert(cdfRanged.filter(col("change_type") === "update_preimage").count() > 0)
  }
}
