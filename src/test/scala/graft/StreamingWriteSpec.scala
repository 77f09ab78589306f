package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{ManifestStore, SnapshotStore}

/** `df.writeStream.toTable("cat.store")` — the catalog's streaming
  * WRITE surface: per-epoch keyed upserts through each store's own
  * mergeDelta, one published version per non-empty micro-batch,
  * exactly-once state under restart replay (the epoch marker), and
  * Update-mode aggregations landing as group-key upserts. */
class StreamingWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_swrite_$tag").toString
    val cat = s"swcat_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (root, cat)
  }

  private def rows(sql: String): Set[(Long, String)] =
    spark.sql(sql).collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet

  test("toTable lands one version per micro-batch on BOTH layouts; upsert by key") {
    for (layout <- Seq("snapshot", "linked")) {
      val (root, cat) = freshCat(s"b_$layout")
      val t = s"st_$layout"
      spark.sql(s"CREATE TABLE $cat.$t (k BIGINT, v STRING) " +
        s"TBLPROPERTIES('key'='k', 'layout'='$layout')")
      implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
      val q = in.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", s"$root/_ckpt_$t")
        .toTable(s"$cat.$t")
      try {
        in.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        assert(rows(s"SELECT * FROM $cat.$t") == Set((1L, "a"), (2L, "b")))
        in.addData((2L, "b2"), (3L, "c")) // upsert on 2, insert 3
        q.processAllAvailable()
        assert(rows(s"SELECT * FROM $cat.$t") ==
          Set((1L, "a"), (2L, "b2"), (3L, "c")))
      } finally q.stop()
      // one version per non-empty epoch on top of the created v1
      val vs =
        if (layout == "linked") new ManifestStore(spark, s"$root/$t", "k").versions()
        else new SnapshotStore(spark, s"$root/$t", "k").versions()
      assert(vs == Seq(1L, 2L, 3L), s"$layout versions: $vs")
      // history pins each epoch: v2 is batch 1's state, immutable
      assert(rows(s"SELECT * FROM $cat.$t VERSION AS OF 2") ==
        Set((1L, "a"), (2L, "b")))
    }
  }

  test("restart from the checkpoint continues — no epoch double-lands") {
    val (root, cat) = freshCat("rs")
    spark.sql(s"CREATE TABLE $cat.st_rs (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    implicit val sqlCtx = spark.sqlContext
    val in1 = MemoryStream[(Long, String)]
    val q1 = in1.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckpt_rs").toTable(s"$cat.st_rs")
    try { in1.addData((1L, "a")); q1.processAllAvailable() } finally q1.stop()
    // a NEW query on the SAME checkpoint: committed epochs replay
    // nothing; only new data lands
    val in2 = MemoryStream[(Long, String)]
    in2.addData((1L, "a")) // memory source replays from scratch...
    val q2 = in2.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckpt_rs2").toTable(s"$cat.st_rs")
    try {
      q2.processAllAvailable() // ...as a SECOND writer: same rows upsert
      in2.addData((2L, "b"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(s"SELECT * FROM $cat.st_rs") == Set((1L, "a"), (2L, "b")))
    // idempotence: replaying identical rows through a second writer
    // changed state by NOTHING — the upsert-sink contract
    assert(rows(s"SELECT * FROM $cat.st_rs VERSION AS OF 2") == Set((1L, "a")))
  }

  test("Update-mode streaming aggregation upserts its group keys") {
    val (root, cat) = freshCat("agg")
    spark.sql(s"CREATE TABLE $cat.st_agg (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("g")
      .groupBy(col("g").as("k")).agg(count(lit(1)).cast("string").as("v"))
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$root/_ckpt_agg").toTable(s"$cat.st_agg")
    try {
      in.addData(1L, 1L, 2L)
      q.processAllAvailable()
      assert(rows(s"SELECT * FROM $cat.st_agg") == Set((1L, "2"), (2L, "1")))
      in.addData(1L) // count(1) -> 3: the updated aggregate upserts
      q.processAllAvailable()
      assert(rows(s"SELECT * FROM $cat.st_agg") == Set((1L, "3"), (2L, "1")))
    } finally q.stop()
  }

  test("an epoch with duplicate keys fails the query loudly") {
    val (root, cat) = freshCat("dup")
    spark.sql(s"CREATE TABLE $cat.st_dup (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='snapshot')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckpt_dup").toTable(s"$cat.st_dup")
    try {
      in.addData((5L, "x"), (5L, "y"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("duplicate") || Option(e.getCause)
        .exists(_.getMessage.contains("duplicate")))
    } finally q.stop()
  }

  test("streaming write + streaming read compose: the change feed sees each epoch") {
    val (root, cat) = freshCat("rt")
    spark.sql(s"CREATE TABLE $cat.st_rt (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val w = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckpt_rt_w").toTable(s"$cat.st_rt")
    try {
      in.addData((1L, "a")); w.processAllAvailable()
      in.addData((1L, "a2"), (2L, "b")); w.processAllAvailable()
    } finally w.stop()
    // the r12 read half over the r12 write half: row-state stream
    // replays the upsert chain the writer produced
    val sink = s"swrite_rt_sink_${System.nanoTime()}"
    val r = spark.readStream.table(s"$cat.st_rt")
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$root/_ckpt_rt_r").start()
    try r.processAllAvailable() finally r.stop()
    val seen = spark.table(sink).select("k", "v").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(seen.sorted == Seq((1L, "a"), (1L, "a2"), (2L, "b")),
      s"change feed saw: $seen")
  }

  test("auto-maintenance: a 50-micro-batch run keeps pool files and versions BOUNDED; content invariant") {
    val (root, cat) = freshCat("am")
    spark.sql(s"CREATE TABLE $cat.st_am (k BIGINT, v STRING) " +
      "TBLPROPERTIES('key'='k', 'layout'='linked')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/_ckpt_am")
      .option("maxFilesPerCommit", "8")
      .option("maxVersionsToKeep", "10")
      .toTable(s"$cat.st_am")
    try {
      (1 to 50).foreach { i =>
        in.addData((i.toLong, s"v$i"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val st = new ManifestStore(spark, s"$root/st_am", "k")
    val tip = st.versions().max
    // CONTENT: every row landed exactly once across compaction/pruning
    assert(rows(s"SELECT * FROM $cat.st_am")
      == (1 to 50).map(i => (i.toLong, s"v$i")).toSet)
    // BOUNDED files: without maybeCompact this is ~50 fragments
    val nFiles = st.manifest(tip).count()
    assert(nFiles <= 12, s"pool fragments unbounded: $nFiles")
    // BOUNDED versions: one per batch + compaction commits, pruned
    assert(st.versions().size <= 10, s"versions unbounded: ${st.versions()}")
    // compaction commits are stamped for the audit trail
    val ops = st.history().select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("compact"), ops.toString)
  }

  test("Bloom index auto-extends at merge: carried files keep their filters byte-for-byte, only new files index; probe prunes") {
    val root = java.nio.file.Files.createTempDirectory("graft_bloomx").toString
    val st = new ManifestStore(spark, s"$root/t", "k", statsCols = Seq("cust"))
    st.write((1L to 400L).map(i => (i, i % 37)).toDF("k", "cust"), 1L, 8)
    st.buildBloomIndex(1L, "cust")
    val idx1 = spark.read.parquet(s"$root/t/_manifests/v=1/_bloom_cust")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // append NEW key range: untouched files carry, fresh files land
    st.mergeDelta(1L, 2L, (401L to 480L).map(i => (i, 9999L)).toDF("k", "cust"))
    val idx2Dir = s"$root/t/_manifests/v=2/_bloom_cust"
    assert(new java.io.File(idx2Dir, "_SUCCESS").exists(),
      "merge did not auto-extend the bloom index")
    val idx2 = spark.read.parquet(idx2Dir)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // carried files: IDENTICAL serialized filters (no rebuild); new
    // files: fresh entries — the index covers the whole v2 file set
    val carried = idx1.keySet intersect idx2.keySet
    assert(carried == idx1.keySet, "a carried file lost its filter")
    carried.foreach(n => assert(idx2(n) == idx1(n), s"$n filter rebuilt"))
    val v2Files = st.manifest(2L).select("file").collect().map(_.getString(0)).toSet
    assert(idx2.keySet == v2Files, "extension must cover every v2 file")
    // probe: the 9999 value lives ONLY in the new files — the extended
    // index prunes every carried file (pre-extension it would open all)
    val (hits, opened) = st.readWhereEquals(2L, "cust", 9999L)
    assert(hits.count() == 80)
    val newFiles = v2Files diff idx1.keySet
    assert(opened <= newFiles.size + 1, s"opened $opened of ${v2Files.size}")
  }
}
