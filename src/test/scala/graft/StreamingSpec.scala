package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamingSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming sessionize closes a session after the event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val sessions = StreamOps.sessionize(input.toDS(), gapMs = 30 * 60000L)
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, ts(0), 10L, "click", 1.0),
        Event(2L, ts(10), 10L, "view", 2.0))
      query.processAllAvailable()
      // second batch: an event far past the gap closes session 1 inline
      input.addData(Event(3L, ts(120), 10L, "click", 5.0))
      query.processAllAvailable()
      val closed = spark.sql("SELECT * FROM graft_sessions WHERE closed").collect()
      assert(closed.length == 1)
      val s = closed.head
      assert(s.getAs[Long]("n_events") == 2L)
      assert(s.getAs[Double]("sum_value") == 3.0)
      assert(s.getAs[Timestamp]("session_start") == ts(0))
      assert(s.getAs[Timestamp]("session_end") == ts(10))
    } finally query.stop()
  }

  test("built-in session_window agrees with custom sessionize on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.sessionWindowCounts(input.toDS(), "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("graft_swin")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, ts(0), 10L, "click", 1.0),
        Event(2L, ts(10), 10L, "view", 2.0))
      query.processAllAvailable()
      input.addData(Event(3L, ts(120), 10L, "click", 5.0))
      query.processAllAvailable()
      input.addData(Event(4L, ts(240), 10L, "click", 0.5))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events, sum_value FROM graft_swin")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      // custom sessionize semantics: session [ts(0), ts(10)], n=2, sum=3;
      // session_window's end is exclusive = last event + gap
      assert(rows.contains((10L, ts(0), ts(40), 2L, 3.0)), s"got $rows")
    } finally query.stop()
  }

  test("mixtureMonitor: drifted windows flag against the baseline, balanced ones pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val docs = input.toDS().toDF("ts", "source")
    val query = StreamOps.mixtureMonitor(docs,
        Map("A" -> 1.0, "B" -> 1.0), "1 hour", "10 minutes", tol = 0.2)
      .writeStream.format("memory").queryName("graft_mix")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour 0: balanced 3/3; hour 1: skewed 5 A / 1 B
      val h0 = (1 to 3).map(i => (ts(i), "A")) ++ (1 to 3).map(i => (ts(3 + i), "B"))
      val h1 = (1 to 5).map(i => (ts(60 + i), "A")) :+ ((ts(70), "B"))
      input.addData(h0 ++ h1: _*)
      query.processAllAvailable()
      input.addData((ts(600), "A")) // watermark flush past both hours
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT window_start, source, n, share, drifted FROM graft_mix")
        .collect().map(r => (r.getTimestamp(0).getTime / 3600000L % 24, r.getString(1),
          r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSet
      val h0w = got.filter(_._3 == 3L)
      assert(h0w.size == 2 && h0w.forall(!_._5), s"balanced hour must not flag: $got")
      assert(h0w.forall(_._4 == 0.5))
      val skewA = got.find(t => t._2 == "A" && t._3 == 5L).get
      val skewB = got.find(t => t._2 == "B" && t._3 == 1L).get
      assert(skewA._4 > 0.8 && skewA._5, s"skewed A must flag: $skewA")
      assert(skewB._5, s"starved B must flag: $skewB")
    } finally query.stop()
  }

  test("cumulativeDistinct: running estimate tracks exact uniques across overlapping batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.cumulativeDistinct(input.toDS())
      .writeStream.format("memory").queryName("graft_cdist")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L to 500L).map(u => Event(u, ts(1), u, "click", 1.0)): _*)
      query.processAllAvailable()
      // second batch: half repeats, half new → exact uniques 750
      input.addData((251L to 750L).map(u => Event(1000L + u, ts(2), u, "click", 1.0)): _*)
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT n_events, approx_distinct FROM graft_cdist ORDER BY n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == 2)
      assert(rows.head._1 == 500L && math.abs(rows.head._2 - 500L) <= 25L)
      assert(rows.last._1 == 1000L && math.abs(rows.last._2 - 750L) <= 38L)
    } finally query.stop()
  }

  test("sampleKStream: maintained bottom-k equals the batch sample under any split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val query = StreamOps.sampleKStream(input.toDS().toDF("lang", "doc_id"),
        "lang", "doc_id", 3)
      .writeStream.format("memory").queryName("graft_samp")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("en", 1L), ("en", 2L), ("en", 3L), ("de", 10L))
      query.processAllAvailable()
      input.addData(("en", 4L), ("en", 5L), ("en", 6L), ("en", 2L)) // dup id too
      query.processAllAvailable()
      val last = spark.sql("SELECT stratum, sample_ids FROM graft_samp")
        .collect().groupBy(_.getString(0)).map { case (s, rs) =>
          s -> rs.last.getAs[scala.collection.Seq[Long]](1).toSet }
      // batch truth: bottom-3 of md5 rank over ids 1..6
      val expected = (1L to 6L).map(id => (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString, id))
        .sorted.take(3).map(_._2).toSet
      assert(last("en") == expected, s"got ${last("en")} want $expected")
      assert(last("de") == Set(10L))
    } finally query.stop()
  }

  test("growthMonitor: day rows close with new/retained/resurrected counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.growthMonitor(input.toDS())
      .writeStream.format("memory").queryName("graft_growth")
      .outputMode(OutputMode.Append()).start()
    try {
      // day 0: users 1,2 (both new); day 1: user 1 (retained) — split
      // across batches; day 3: user 2 (resurrected, skipping day 2)
      input.addData(
        Event(1L, ts(0), 1L, "a", 1.0), Event(2L, ts(10), 2L, "a", 1.0))
      query.processAllAvailable()
      input.addData(
        Event(3L, ts(60 * 24), 1L, "a", 1.0),
        Event(4L, ts(60 * 24 * 3), 2L, "a", 1.0),
        Event(5L, ts(60 * 24 * 3 + 5), 2L, "a", 1.0)) // same-day dup: no second row
      query.processAllAvailable()
      input.addData(Event(99L, ts(60 * 24 * 10), 3L, "a", 1.0)) // flush watermark
      query.processAllAvailable()
      val got = spark.sql("SELECT day, cls, n FROM graft_growth")
        .collect().map(r => (r.getTimestamp(0).getTime / 86400000L, r.getString(1), r.getLong(2)))
        .toSet
      val d0 = 1700000000000L / 86400000L // epoch day of ts(0)
      assert(got.contains((d0, "new", 2L)), s"got $got")
      assert(got.contains((d0 + 1, "retained", 1L)), s"got $got")
      assert(got.contains((d0 + 3, "resurrected", 1L)), s"got $got")
      assert(!got.exists(t => t._1 == d0 + 3 && t._3 > 1L), "same-day dup must not double-count")
    } finally query.stop()
  }

  test("featureStream: latest upsert per user equals the batch feature row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.featureStream(input.toDS())
      .writeStream.format("memory").queryName("graft_feat")
      .outputMode(OutputMode.Update()).start()
    try {
      // split user 7's history across two batches; user 8 in one
      input.addData(
        Event(1L, ts(0), 7L, "click", 1.5),
        Event(2L, ts(10), 8L, "view", 2.0))
      query.processAllAvailable()
      input.addData(
        Event(3L, ts(60 * 48), 7L, "error", 0.25)) // two days later
      query.processAllAvailable()
      // take each user's LAST emitted row (Update-mode upsert stream)
      val rows = spark.sql("SELECT * FROM graft_feat").collect()
        .groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
          u -> rs.maxBy(_.getAs[Long]("n_events")) }
      val u7 = rows(7L)
      assert(u7.getAs[Long]("n_events") == 2L)
      assert(u7.getAs[Long]("n_active_days") == 2L && u7.getAs[Long]("span_days") == 2L)
      assert(u7.getAs[Double]("sum_value") == 1.75)
      assert(u7.getAs[Map[String, Long]]("type_counts") == Map("click" -> 1L, "error" -> 1L))
      assert(u7.getAs[Double]("error_share") == 0.5)
      // parity with the batch operator over the full history
      val batch = graft.operators.Events.userFeatures(
        Seq((1L, ts(0), 7L, "click", 1.5), (3L, ts(60 * 48), 7L, "error", 0.25))
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        Seq("click", "error")).collect().head
      assert(batch.getAs[Long]("n_events") == 2L
        && batch.getAs[Long]("n_active_days") == 2L
        && batch.getAs[Double]("sum_value") == 1.75)
      assert(rows(8L).getAs[Long]("n_events") == 1L)
    } finally query.stop()
  }

  test("ksMonitor: matching window reads D=0, shifted window trips the gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // reference: uniform on [0,100] sampled at quartile cuts
    val query = StreamOps.ksMonitor(input.toDS().toDF(),
        cuts = Seq(25.0, 50.0, 75.0), refCdf = Seq(0.25, 0.5, 0.75))
      .writeStream.format("memory").queryName("graft_ks")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour 0: one value per quartile → empirical CDF == reference
      val h0 = Seq(10.0, 30.0, 60.0, 90.0).zipWithIndex.map { case (v, i) =>
        Event(i.toLong, ts(i + 1), 1L, "m", v) }
      // hour 1: everything in the top bin → D = 0.75 at the third cut
      val h1 = Seq(80.0, 85.0, 90.0, 95.0).zipWithIndex.map { case (v, i) =>
        Event(10L + i, ts(60 + i + 1), 1L, "m", v) }
      input.addData(h0 ++ h1: _*)
      query.processAllAvailable()
      input.addData(Event(99L, ts(600), 1L, "m", 50.0)) // watermark flush
      query.processAllAvailable()
      val got = spark.sql("SELECT n, d_stat, drifted FROM graft_ks WHERE n = 4")
        .collect().map(r => (r.getDouble(1), r.getBoolean(2))).toSet
      assert(got == Set((0.0, false), (0.75, true)), s"got $got")
    } finally query.stop()
  }

  test("burstMonitor: hour rows carry the peak minute and the total") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.burstMonitor(input.toDS().toDF())
      .writeStream.format("memory").queryName("graft_burst")
      .outputMode(OutputMode.Append()).start()
    try {
      // one 3-event minute burst + two sparse minutes in the same hour
      input.addData(
        Event(1L, ts(1), 1L, "click", 1.0),
        Event(2L, ts(1), 2L, "click", 1.0),
        Event(3L, ts(1), 3L, "click", 1.0),
        Event(4L, ts(12), 1L, "click", 1.0),
        Event(5L, ts(25), 1L, "click", 1.0))
      query.processAllAvailable()
      input.addData(Event(99L, ts(600), 1L, "flush", 0.0))
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT event_type, peak_n, n_total FROM graft_burst WHERE event_type = 'click'")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq(("click", 3L, 5L)), s"got ${got.toSeq}")
    } finally query.stop()
  }

  test("tumblingCounts: closed windows match the batch tumbling aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.tumblingCounts(input.toDS().toDF(), "1 hour")
      .writeStream.format("memory").queryName("graft_tumb")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, ts(5), 10L, "click", 1.0),
        Event(2L, ts(20), 11L, "click", 2.0),
        Event(3L, ts(30), 10L, "view", 4.0),
        Event(4L, ts(70), 10L, "click", 8.0)) // next hour
      query.processAllAvailable()
      input.addData(Event(9L, ts(300), 77L, "flush", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_tumb").collect()
        .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      // windows align to wall-clock hour boundaries, not first-event ts
      val h0 = new Timestamp(ts(0).getTime / 3600000L * 3600000L)
      val h1 = new Timestamp(h0.getTime + 3600000L)
      assert(got.contains((h0, "click", 2L, 3.0)), s"got $got")
      assert(got.contains((h0, "view", 1L, 4.0)))
      assert(got.contains((h1, "click", 1L, 8.0)))
    } finally query.stop()
  }

  test("hoppingCounts: closed overlapping windows match the batch hopping aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Event]
    val query = StreamOps.hoppingCounts(input.toDS().toDF(), "1 hour", "15 minutes")
      .writeStream.format("memory").queryName("graft_hop")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = Seq(
        Event(1L, ts(0), 1L, "click", 1.0),
        Event(2L, ts(10), 1L, "click", 2.0),  // same window cover as ts(0) for 3 of 4 hops
        Event(3L, ts(20), 2L, "view", 5.0))
      input.addData(evs: _*)
      query.processAllAvailable()
      // far-future event advances the watermark past every earlier
      // window end; its own windows stay open and must NOT emit
      input.addData(Event(99L, ts(600), 1L, "flush", 0.0))
      query.processAllAvailable()
      val got = spark.sql("SELECT window.start, event_type, n, sum_value FROM graft_hop")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val exp = evs.toDS()
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == exp, s"stream $got\nbatch $exp")
      // ts(0) and ts(10) land in ADJACENT 15-min buckets: 4 windows
      // each, union 5 distinct click windows, 3 of them shared
      assert(exp.count(_._2 == "click") == 5)
      assert(exp.filter(_._2 == "click").count(_._3 == 2L) == 3)
    } finally query.stop()
  }

  test("annIndexStream advances the IVFPQ index with each CoW merge; search equals a full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.{Similarity, SnapshotStore}
    val base = Files.createTempDirectory("graft_ann_stream").toString
    val store = new SnapshotStore(spark, s"$base/store", "vec_id")
    // 4 well-separated clusters in 16 dims (the ivfpq spec corpus)
    def vec(i: Long): Array[Float] = {
      val c = (i % 4).toInt
      Array.tabulate(16)(t =>
        (if (t >= 4 * c && t < 4 * c + 4) 4.0f else 0.0f) + ((i + t) % 3) * 0.05f)
    }
    val v1 = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    store.writeRangePartitioned(v1, 1L, 4)
    val idxBase = s"$base/idx"
    Similarity.writeIvfpqIndex(store.read(1L), s"$idxBase/v=1",
      nCells = 4, m = 4, ksub = 8, iters = 3)
    val input = MemoryStream[(Long, Array[Float], String)]
    val query = StreamOps.annIndexStream(
      input.toDS().toDF("vec_id", "embedding", "change_type"),
      store, idxBase, Files.createTempDirectory("graft_ann_ckpt").toString)
    try {
      // batch 0: move vec 3 to cluster 0's corner, add new vec 100
      input.addData((3L, vec(0L).map(_ + 0.1f), "update"), (100L, vec(0L), "insert"))
      query.processAllAvailable()
      // batch 1: delete vec 7
      input.addData((7L, Array.empty[Float], "delete"))
      query.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
          .sortBy(t => (t._1, t._4)).toList
      val q = store.read(3L).filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      // incremental chain v1→v2→v3 must search exactly like a frozen-
      // quantizer re-encode of the final corpus (same cents/books)
      val full = s"$base/idx_full"
      val cents = Similarity.loadCentroids(spark, s"$idxBase/v=1/centroids")
      val books = Similarity.loadPqBooks(spark, s"$idxBase/v=1/books")
      Similarity.saveCentroids(spark, cents, s"$full/centroids")
      Similarity.savePqBooks(spark, books, s"$full/books")
      Similarity.updateIvfpqIndex(spark, store, 1L, 3L, s"$idxBase/v=1", s"$full/x")
      assert(canon(Similarity.ivfpqTopKFrom(spark, s"$idxBase/v=3", q, k = 3, nprobe = 2)) ==
        canon(Similarity.ivfpqTopKFrom(spark, s"$full/x", q, k = 3, nprobe = 2)))
    } finally query.stop()
  }

  test("bm25IndexStream lands each CDC batch as a segment; search tracks the live corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.TextAnalysis
    val path = Files.createTempDirectory("graft_bm25_stream").toString + "/idx"
    val base = Seq((1L, "apple apple"), (2L, "apple banana"), (3L, "banana filler"))
      .toDF("doc_id", "text")
    TextAnalysis.writeBm25Index(base, path, nBuckets = 16)
    val input = MemoryStream[(Long, String, String)]
    val query = StreamOps.bm25IndexStream(
      input.toDS().toDF("doc_id", "text", "change_type"),
      path, Files.createTempDirectory("graft_bm25_ckpt").toString, nBuckets = 16)
    try {
      // batch 0: update doc 1, insert doc 4
      input.addData((1L, "banana banana", "update"), (4L, "apple apple apple", "insert"))
      query.processAllAvailable()
      // batch 1: DELETE-only (empty postings segment must still read)
      input.addData((3L, "", "delete"))
      query.processAllAvailable()
      val live = Seq(
        (1L, "banana banana"), (2L, "apple banana"), (4L, "apple apple apple")
      ).toDF("doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
          .sortBy(_._1).toList
      assert(canon(TextAnalysis.bm25SearchFrom(spark, path,
          Seq("apple", "banana"), topK = 10, nBuckets = 16)) ==
        canon(TextAnalysis.bm25Search(live, Seq("apple", "banana"), topK = 10)))
    } finally query.stop()
  }

  test("bm25IndexStream survives out-of-band compaction: later batches allocate above the compacted segment") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.TextAnalysis
    val path = Files.createTempDirectory("graft_bm25_compact").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft_bm25_compact_ckpt").toString
    val base = Seq((1L, "apple apple"), (2L, "apple banana"), (3L, "banana filler"))
      .toDF("doc_id", "text")
    TextAnalysis.writeBm25Index(base, path, nBuckets = 16)
    val input = MemoryStream[(Long, String, String)]
    val mkQuery = () => StreamOps.bm25IndexStream(
      input.toDS().toDF("doc_id", "text", "change_type"), path, ckpt, nBuckets = 16)
    val q1 = mkQuery()
    try {
      input.addData((1L, "banana banana", "update"), (4L, "apple apple apple", "insert"))
      q1.processAllAvailable()
    } finally q1.stop()
    // out-of-band compaction between micro-batches: folds seg 0+1 into
    // the next free id. Under the old batchId+1 scheme the NEXT stream
    // batch would collide with exactly this segment and silently skip.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def segDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg=")).map(_.stripPrefix("seg=").toLong)
      .sorted.toSeq
    assert(segDirs() == Seq(0L, 1L))
    TextAnalysis.compactBm25Index(spark, path, 2L)
    assert(segDirs() == Seq(2L))
    val q2 = mkQuery()
    try {
      // batch 1 after restart: delete doc 3, update doc 2 — must land
      // ABOVE the compacted segment (seg 3), not collide at seg 2
      input.addData((3L, "", "delete"), (2L, "banana banana banana", "update"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(segDirs() == Seq(2L, 3L))
    val live = Seq(
      (1L, "banana banana"), (2L, "banana banana banana"), (4L, "apple apple apple")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toList
    assert(canon(TextAnalysis.bm25SearchFrom(spark, path,
        Seq("apple", "banana"), topK = 10, nBuckets = 16)) ==
      canon(TextAnalysis.bm25Search(live, Seq("apple", "banana"), topK = 10)))
  }

  test("bm25IndexStream allocation is O(1) and poison-tolerant; _max advances per allocation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.TextAnalysis
    val path = Files.createTempDirectory("graft_bm25_alloc").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft_bm25_alloc_ckpt").toString
    TextAnalysis.writeBm25Index(
      Seq((1L, "apple apple")).toDF("doc_id", "text"), path, nBuckets = 16)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val input = MemoryStream[(Long, String, String)]
    val mkQuery = () => StreamOps.bm25IndexStream(
      input.toDS().toDF("doc_id", "text", "change_type"), path, ckpt, nBuckets = 16)
    val q1 = mkQuery()
    try {
      input.addData((2L, "banana banana", "insert"))
      q1.processAllAvailable()
    } finally q1.stop()
    // _max advanced on ALLOCATION, not just at compaction — the crash
    // window where a marker holds an id invisible to compaction is gone
    assert(TextAnalysis.readAllocMax(fs, path) == 1L)
    // plant every crash-leftover shape the allocator must shrug off,
    // plus a garbage-content visible marker: the old allocator opened
    // EVERY marker with a bare .toLong, so any one of these wedged the
    // stream with NumberFormatException forever. The garbage marker
    // doubles as proof the per-batch path no longer opens sibling
    // markers at all (it would throw if it did — Try or not, the old
    // shape's max() would see garbage→None and still work, so the
    // strong assertion is the empty .tmp files plus segment landing).
    def plant(name: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_batches/$name"), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    plant(".batch-999.tmp", "")
    plant("._max.tmp-deadbeef", "")
    plant("batch-7777", "not-a-number")
    val q2 = mkQuery()
    try {
      input.addData((3L, "cherry cherry", "insert"))
      q2.processAllAvailable()
    } finally q2.stop()
    def segDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg="))
      .map(_.stripPrefix("seg=").toLong).sorted.toSeq
    assert(segDirs() == Seq(0L, 1L, 2L), s"segments after poisoned batch: ${segDirs()}")
    assert(TextAnalysis.readAllocMax(fs, path) == 2L)
    // the index still searches correctly
    val live = Seq((1L, "apple apple"), (2L, "banana banana"), (3L, "cherry cherry"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toList
    assert(canon(TextAnalysis.bm25SearchFrom(spark, path,
        Seq("apple", "banana", "cherry"), topK = 10, nBuckets = 16)) ==
      canon(TextAnalysis.bm25Search(live, Seq("apple", "banana", "cherry"), topK = 10)))
  }

  test("bm25IndexStream replay reuses its recorded segment id, not a fresh allocation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.TextAnalysis
    val path = Files.createTempDirectory("graft_bm25_replay").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft_bm25_replay_ckpt").toString
    TextAnalysis.writeBm25Index(
      Seq((1L, "apple apple")).toDF("doc_id", "text"), path, nBuckets = 16)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a batch that crashed AFTER publishing its marker (id 5)
    // but BEFORE landing its segment: the replay must land at seg 5
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_batches"))
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_batches/batch-0"), true)
    try out.write("5".getBytes("UTF-8")) finally out.close()
    val input = MemoryStream[(Long, String, String)]
    val query = StreamOps.bm25IndexStream(
      input.toDS().toDF("doc_id", "text", "change_type"), path, ckpt, nBuckets = 16)
    try {
      input.addData((2L, "banana banana", "insert"))
      query.processAllAvailable()
    } finally query.stop()
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg="))
      .map(_.stripPrefix("seg=").toLong).sorted.toSeq
    assert(segs == Seq(0L, 5L), s"replay should reuse recorded seg 5, got $segs")
  }

  test("bm25IndexStream in-stream auto-compaction folds segments and stays searchable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.TextAnalysis
    val path = Files.createTempDirectory("graft_bm25_autoc").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft_bm25_autoc_ckpt").toString
    TextAnalysis.writeBm25Index(
      Seq((1L, "apple apple"), (2L, "apple banana")).toDF("doc_id", "text"),
      path, nBuckets = 16)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def segDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg="))
      .map(_.stripPrefix("seg=").toLong).sorted.toSeq
    val input = MemoryStream[(Long, String, String)]
    val query = StreamOps.bm25IndexStream(
      input.toDS().toDF("doc_id", "text", "change_type"), path, ckpt,
      nBuckets = 16, autoCompactMaxSegments = Some(2))
    try {
      input.addData((3L, "cherry cherry", "insert"))
      query.processAllAvailable()       // segs 0,1 → at threshold, no compact
      assert(segDirs() == Seq(0L, 1L))
      input.addData((4L, "banana cherry", "insert"))
      query.processAllAvailable()       // segs 0,1,2 → folds into seg 3
      assert(segDirs() == Seq(3L), s"expected compacted seg 3, got ${segDirs()}")
      input.addData((1L, "", "delete"))
      query.processAllAvailable()       // next batch allocates above
      assert(segDirs() == Seq(3L, 4L))
    } finally query.stop()
    val live = Seq((2L, "apple banana"), (3L, "cherry cherry"), (4L, "banana cherry"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toList
    assert(canon(TextAnalysis.bm25SearchFrom(spark, path,
        Seq("apple", "banana", "cherry"), topK = 10, nBuckets = 16)) ==
      canon(TextAnalysis.bm25Search(live, Seq("apple", "banana", "cherry"), topK = 10)))
  }

  test("streamingTopTokens: Misra-Gries keeps the hot token within its error bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 60 occurrences of "hot" + 40 distinct rare tokens, capacity 10:
    // total N=100, so "hot" may undercount by at most N/cap = 10
    val hotDoc = Seq.fill(60)("hot").mkString(" ")
    val rareDocs = (0 until 40).map(i => s"rare$i").grouped(8).map(_.mkString(" ")).toSeq
    val input = MemoryStream[(String, String)]
    val query = StreamOps.streamingTopTokens(
        input.toDS().toDF("lang", "text"), capacity = 10, k = 3)
      .writeStream.format("memory").queryName("graft_mg")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("en", hotDoc) +: rareDocs.map(("en", _)): _*)
      query.processAllAvailable()
      val rows = spark.sql("SELECT tokens, min_counts FROM graft_mg").collect()
      val (tokens, counts) = (rows.last.getSeq[String](0), rows.last.getSeq[Long](1))
      assert(tokens.head == "hot")
      assert(counts.head >= 50L && counts.head <= 60L, s"got ${counts.head}")
      // second batch: counts keep folding into the same bounded state
      input.addData(("en", "hot hot hot"))
      query.processAllAvailable()
      val after = spark.sql("SELECT min_counts FROM graft_mg").collect()
        .map(_.getSeq[Long](0).head).max
      assert(after >= counts.head + 3L - 1L)
    } finally query.stop()
  }

  test("perplexityFilter scores a stream identically to the batch twin and drops garble") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.TextAnalysis
    // reference model: fluent prose with a strong dominant bigram walk
    val ref = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "the cat sat on the mat and the cat sat again")).toDF("doc_id", "text")
    val model = TextAnalysis.compactBigramLm(ref, maxVocab = 100, maxBigrams = 200)
    val arriving = Seq(
      (10L, "the cat sat on the mat"),   // on-model → low ppl
      (11L, "mat sat the on cat mat the沙"), // off-model + OOV → high ppl
      (12L, "solo"))                     // 1 token → unscorable, KEPT
    // batch twin scores
    val batch = TextAnalysis.perplexityWith(arriving.toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(batch(12L).isEmpty)
    assert(batch(10L).get < batch(11L).get)
    val cut = (batch(10L).get + batch(11L).get) / 2.0
    val input = MemoryStream[(Long, String)]
    val gated = StreamOps.perplexityFilter(
      input.toDS().toDF("doc_id", "text"), model, cut)
    val query = gated.writeStream
      .format("memory").queryName("graft_ppl").outputMode(OutputMode.Append()).start()
    try {
      input.addData(arriving: _*)
      query.processAllAvailable()
      val out = spark.sql("SELECT doc_id, ppl FROM graft_ppl").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      // garble dropped; fluent kept with the BATCH-IDENTICAL score;
      // the unscorable doc passes through with a null ppl
      assert(out.keySet == Set(10L, 12L))
      assert(out(10L) == batch(10L))
      assert(out(12L).isEmpty)
    } finally query.stop()
  }

  test("decontaminateStream drops exactly the docs the batch audit flags") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Dedup, Pipeline}
    val bench = Seq((100L, "what is the capital of france paris is the capital of france"))
      .toDF("doc_id", "text")
    val benchSet = Dedup.docShingles(bench, 3).select("shingle")
      .collect().map(_.getString(0)).toSet
    val trainDocs = Seq(
      (1L, "quiz answers what is the capital of france paris is the capital of france end"),
      (2L, "the capital of norway is oslo which is a coastal city"),
      (3L, "spark plans are optimized by catalyst before execution begins"))

    val input = MemoryStream[(Long, String)]
    val gated = StreamOps.decontaminateStream(
      input.toDS().toDF("doc_id", "text"), benchSet, 3, 5)
    val query = gated.writeStream
      .format("memory").queryName("graft_decontam").outputMode(OutputMode.Append()).start()
    try {
      input.addData(trainDocs: _*)
      query.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM graft_decontam").collect()
        .map(_.getLong(0)).toSet
      // batch audit flags doc 1 only → the stream keeps exactly 2 and 3
      val flagged = Pipeline.decontaminate(trainDocs.toDF("doc_id", "text"), bench, 3, 5)
        .collect().map(_.getLong(0)).toSet
      assert(flagged == Set(1L))
      assert(kept == Set(2L, 3L))
    } finally query.stop()
  }

  test("streamingWma equals the batch 30-day WMA on every finalized day") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def dts(day: Long, off: Long = 1000L) = new Timestamp(day * 86400000L + off)
    val evs = Seq(
      Event(1L, dts(100), 10L, "m", 2.5),
      Event(2L, dts(100, 2000L), 11L, "m", 1.25),
      Event(3L, dts(101), 10L, "m", 4.75),
      Event(4L, dts(103), 12L, "m", 0.5),  // gap at 102 → zero row
      Event(5L, dts(140), 13L, "m", 9.0))  // sentinel: advances the watermark
    val input = MemoryStream[Event]
    val query = StreamOps.streamingWma(input.toDS()).writeStream
      .format("memory").queryName("graft_swma").outputMode(OutputMode.Append()).start()
    try {
      input.addData(evs.take(4): _*)
      query.processAllAvailable()
      input.addData(evs(4))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT day, n, sum_value, wma FROM graft_swma").collect()
        .map(r => r.getTimestamp(0).getTime / 86400000L ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(streamed.contains(100L) && streamed.contains(102L))
      assert(streamed(102L)._1 == 0L) // the gap day arrived as a zero row

      // batch reference: the ev_wma pipeline over the same events
      import graft.operators.Events
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy("event_type").orderBy("d").rowsBetween(-29, 0)
      val batch = Events.dailyFilled(evs.toDF())
        .withColumn("d", datediff(col("day"), lit("1970-01-01")).cast("long"))
        .withColumn("s1", sum(col("sv")).over(win))
        .withColumn("s2", sum(col("sv") * col("d")).over(win))
        .withColumn("m", count(lit(1)).over(win))
        .withColumn("den", lit(30L) * col("m") - col("m") * (col("m") - 1) / 2)
        .withColumn("wma", round(
          ((lit(30L) - col("d")) * col("s1") + col("s2")).cast("double") / col("den"), 4))
        .select(col("d"), col("n"), round(col("sv").cast("double"), 4).as("sum_value"), col("wma"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      streamed.foreach { case (day, got) =>
        assert(batch(day) == got, s"day $day: batch ${batch(day)} vs streamed $got")
      }
    } finally query.stop()
  }

  test("streamingHolt equals the batch 16-tap Holt forecast on every warm finalized day") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def dts(day: Long, off: Long = 1000L) = new Timestamp(day * 86400000L + off)
    // 20 observed days with a gap (day 107 absent → zero row in both
    // engines) + a far sentinel that advances the watermark
    val evs = (100L to 119L).filter(_ != 107L).zipWithIndex.map { case (d, i) =>
      Event(i.toLong, dts(d), 10L + i, "m", 1.0 + (d % 5) * 2.25)
    } :+ Event(99L, dts(160L), 99L, "m", 3.0)
    val input = MemoryStream[Event]
    val query = StreamOps.streamingHolt(input.toDS()).writeStream
      .format("memory").queryName("graft_sholt").outputMode(OutputMode.Append()).start()
    try {
      input.addData(evs.take(7): _*)
      query.processAllAvailable()
      input.addData(evs.drop(7): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT day, holt_next FROM graft_sholt").collect()
        .map(r => r.getTimestamp(0).getTime / 86400000L -> r.getDouble(1)).toMap
      // warm-up: first emission at the 16th finalized day (115)
      assert(streamed.nonEmpty && streamed.keys.min == 115L, streamed.keys.toSeq.sorted)
      val batch = graft.operators.Events.holtDaily(evs.toDF(), 16)
        .withColumn("d", datediff(col("day"), lit("1970-01-01")).cast("long"))
        .collect().map(r => r.getAs[Long]("d") -> r.getAs[Double]("holt_next")).toMap
      streamed.foreach { case (day, got) =>
        assert(batch(day) == got, s"day $day: batch ${batch(day)} vs streamed $got")
      }
    } finally query.stop()
  }

  test("continuousMerge publishes one copy-on-write version per CDC batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore

    val base = Files.createTempDirectory("graft_cmerge").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 500L).map(i => (i, s"row_$i")).toDF("k", "s")
    store.writeRangePartitioned(df, 1L, 8)

    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDS().toDF("k", "s", "change_type")
    val ckpt = Files.createTempDirectory("graft_cmerge_ckpt").toString
    val query = StreamOps.continuousMerge(changes, store, "k", ckpt)
    try {
      // batch 0: update key 5, insert 1001
      input.addData((5L, "upd_5", "update"), (1001L, "new_1001", "insert"))
      query.processAllAvailable()
      assert(store.versions().contains(2L))
      val v2 = store.read(2L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v2(5L) == "upd_5" && v2(1001L) == "new_1001" && v2.size == 501)

      // batch 1: delete key 7 — chained off v2, not the base
      input.addData((7L, "", "delete"))
      query.processAllAvailable()
      val v3 = store.read(3L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(!v3.contains(7L) && v3(5L) == "upd_5" && v3.size == 500)

      // the chain stayed copy-on-write: v3 still shares untouched
      // basenames with v1, and its zone map prunes correctly
      val v1Names = store.zoneMap(1L).get.collect()
        .map(_.getAs[String]("file").split('/').last).toSet
      val v3Names = store.zoneMap(3L).get.collect()
        .map(_.getAs[String]("file").split('/').last).toSet
      assert((v1Names intersect v3Names).size >= 5)
      val ranged = store.readKeyRange(3L, 100L, 200L).collect().map(_.getLong(0)).toSet
      assert(ranged == (100L to 200L).toSet)
    } finally query.stop()
  }

  test("linkedMergeStream: one shared-pool version per batch, replay skips committed") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ManifestStore

    val base = Files.createTempDirectory("graft_lmerge").toString
    val store = new ManifestStore(spark, base, "k")
    store.write((1L to 500L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, numFiles = 8)

    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDS().toDF("k", "s", "change_type")
    val ckpt = Files.createTempDirectory("graft_lmerge_ckpt").toString
    val query = StreamOps.linkedMergeStream(changes, store, "k", ckpt)
    try {
      input.addData((5L, "upd_5", "update"), (1001L, "new_1001", "insert"))
      query.processAllAvailable()
      val v2 = store.read(2L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v2(5L) == "upd_5" && v2(1001L) == "new_1001" && v2.size == 501)

      input.addData((7L, "", "delete"))
      query.processAllAvailable()
      val v3 = store.read(3L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(!v3.contains(7L) && v3(5L) == "upd_5" && v3.size == 500)

      // the chain stayed LINKED: v3's manifest still references pool
      // files v1 published (shared by name, zero copies)
      val v1Files = store.manifest(1L).select("file").as[String].collect().toSet
      val v3Files = store.manifest(3L).select("file").as[String].collect().toSet
      assert((v1Files intersect v3Files).size >= 5)
      val ranged = store.readKeyRange(3L, 100L, 200L).collect().map(_.getLong(0)).toSet
      assert(ranged == (100L to 200L).toSet)
    } finally query.stop()
  }

  test("continuousMerge survives a restart: versions keep deriving from the recorded base") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore

    val base = Files.createTempDirectory("graft_cmerge_rs").toString
    val store = new SnapshotStore(spark, base, "k")
    store.writeRangePartitioned((1L to 300L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, 6)

    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDS().toDF("k", "s", "change_type")
    val ckpt = Files.createTempDirectory("graft_cmerge_rs_ckpt").toString
    val q1 = StreamOps.continuousMerge(changes, store, "k", ckpt)
    try {
      input.addData((5L, "upd_5", "update"))
      q1.processAllAvailable()
      input.addData((301L, "new_301", "insert"))
      q1.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L))
    } finally q1.stop()

    // restart from the SAME checkpoint: store.latestVersion() is now 3,
    // but batchIds resume from the checkpoint, so versions must keep
    // deriving from the once-recorded base (1) — the pre-fix code
    // recomputed base=3, targeted v=3+2+1=6, and merged from a
    // nonexistent v=5, permanently wedging the stream
    val q2 = StreamOps.continuousMerge(changes, store, "k", ckpt)
    try {
      input.addData((7L, "", "delete"))
      q2.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L, 4L))
      val v4 = store.read(4L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(!v4.contains(7L) && v4(5L) == "upd_5" && v4(301L) == "new_301")
      assert(v4.size == 300)
    } finally q2.stop()
  }

  test("continuousMerge carries a mid-stream column add: restores serve the evolved schema with correct nulls") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore

    val base = Files.createTempDirectory("graft_cmerge_evo").toString
    val store = new SnapshotStore(spark, base, "k")
    store.writeRangePartitioned((1L to 300L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, 6)
    val ckpt = Files.createTempDirectory("graft_cmerge_evo_ckpt").toString

    // phase 1: the CDC feed carries (k, s)
    val in1 = MemoryStream[(Long, String, String)]
    val q1 = StreamOps.continuousMerge(in1.toDS().toDF("k", "s", "change_type"),
      store, "k", ckpt)
    try {
      in1.addData((5L, "upd_5", "update"))
      q1.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L))
    } finally q1.stop()

    // phase 2: upstream added column w to the feed — the daily-merge
    // loop must keep publishing (this used to throw in unionByName)
    val in2 = MemoryStream[(Long, String, Double, String)]
    val q2 = StreamOps.continuousMerge(in2.toDS().toDF("k", "s", "w", "change_type"),
      store, "k", ckpt)
    try {
      // a restarted source first re-delivers committed batch 0 (here:
      // phase 1's row, now in the widened schema); the committed-
      // version skip must drop it without publishing
      in2.addData((5L, "upd_5", 0.0, "update"))
      q2.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L))
      in2.addData((301L, "new_301", 2.5, "insert"), (9L, "upd_9", 1.25, "update"))
      q2.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L))
      val v3 = store.read(3L)
      assert(v3.columns.toSeq == Seq("k", "s", "w"))
      val m = v3.collect()
        .map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
      assert(m(301L) == ("new_301", Some(2.5)) && m(9L) == ("upd_9", Some(1.25)))
      // rows from before the evolution — both the rewritten survivor
      // file and byte-carried files — read null for w
      assert(m(5L) == ("upd_5", None) && m(100L) == ("row_100", None))
      assert(m.size == 301)
      // a later delete-only batch keeps flowing on the evolved store
      in2.addData((7L, "", 0.0, "delete"))
      q2.processAllAvailable()
      val v4 = store.read(4L)
      assert(v4.columns.toSeq == Seq("k", "s", "w"))
      assert(v4.count() == 300 && v4.filter($"k" === 7L).count() == 0)
    } finally q2.stop()
  }

  test("chunkBackupStream: each CDC batch publishes one repository version; GC reclaims retired versions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ChunkStore

    val master = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    val base = Files.createTempDirectory("graft_chunk_stream").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 8)
    def pay(s: String) = s.getBytes("UTF-8")
    def body(seed: Int) = (0 until 40).map(i => s"blk-$seed-$i").mkString(" ")
    store.backup(Seq((1L, pay(body(1))), (2L, pay(body(2))), (3L, pay(body(3))))
      .toDF("id", "payload"), "id", "payload", 1L)
    val refsBase = store.refs().count()

    val input = MemoryStream[(Long, Array[Byte], String)]
    val query = StreamOps.chunkBackupStream(
      input.toDS().toDF("id", "payload", "change_type"),
      store, Files.createTempDirectory("graft_chunk_stream_ckpt").toString)
    try {
      // batch 0: edit payload 1 (prefix — CDC boundaries resync, most
      // chunks dedupe), insert payload 4
      input.addData((1L, pay("EDITED " + body(1)), "update"), (4L, pay(body(4)), "insert"))
      query.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L))
      // batch 1: delete payload 2 — delta crypto is zero, manifest-only
      input.addData((2L, Array.empty[Byte], "delete"))
      query.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L))
    } finally query.stop()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(canon(store.restore(3L)) == Map(
      1L -> pay("EDITED " + body(1)).toSeq,
      3L -> pay(body(3)).toSeq,
      4L -> pay(body(4)).toSeq))
    // dedup held: the edit re-synchronized, so far fewer refs landed
    // than a fresh corpus would need
    val grown = store.refs().count() - refsBase
    assert(grown > 0 && grown < refsBase, s"delta added $grown refs vs base $refsBase")
    // out-of-band GC retires v1+v2; the tip keeps restoring byte-identical
    val (pruned, nDead, reclaimed) = store.pruneChunks(keep = Seq(3L))
    assert(pruned == Seq(1L, 2L) && nDead > 0 && reclaimed > 0)
    assert(canon(store.restore(3L))(1L) == pay("EDITED " + body(1)).toSeq)
  }

  test("chunkBackupStream autoParity keeps sidecars current; mid-stream loss repairs with no replica") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ChunkStore

    val master = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    val base = Files.createTempDirectory("graft_chunk_parity_stream").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 4)
    def pay(s: String) = s.getBytes("UTF-8")
    def body(seed: Int) = (0 until 40).map(i => s"blk-$seed-$i").mkString(" ")
    store.backup(Seq((1L, pay(body(1))), (2L, pay(body(2))))
      .toDF("id", "payload"), "id", "payload", 1L)
    store.buildParity()

    val input = MemoryStream[(Long, Array[Byte], String)]
    val query = StreamOps.chunkBackupStream(
      input.toDS().toDF("id", "payload", "change_type"),
      store, Files.createTempDirectory("graft_chunk_parity_ckpt").toString,
      autoParity = true)
    try {
      input.addData((3L, pay(body(3)), "insert"))
      query.processAllAvailable()
      input.addData((1L, pay("EDITED " + body(1)), "update"))
      query.processAllAvailable()
    } finally query.stop()
    // the stream that appended blob files also kept parity current
    assert(store.verifyParity().collect()
      .forall(_.getAs[String]("status") == "covered"))
    // lose one file — incl. possibly one the STREAM just appended —
    // and repair from parity alone
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/chunks"))
      .filter(_.isDirectory).flatMap(b => fs.listStatus(b.getPath))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .maxBy(_.getModificationTime).getPath // newest = stream-appended
    fs.delete(victim, false)
    val (repaired, unrepairable) = store.repairFromParity()
    assert(repaired.nonEmpty && unrepairable.isEmpty)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(canon(store.restore(3L)) == Map(
      1L -> pay("EDITED " + body(1)).toSeq,
      2L -> pay(body(2)).toSeq,
      3L -> pay(body(3)).toSeq))
    assert(store.scrub()
      .filter(org.apache.spark.sql.functions.col("status") =!= "ok").count() == 0)
  }

  test("lakeLinkedMergeStream: atomic groups over shared-pool tables; empty slices advance by pure reference") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ManifestStore

    val base = Files.createTempDirectory("graft_lake_linked").toString
    val orders = new ManifestStore(spark, s"$base/orders", "k")
    val items = new ManifestStore(spark, s"$base/items", "k")
    orders.write((1L to 200L).map(i => (i, s"o_$i")).toDF("k", "s"), 1L, 4)
    items.write((1L to 300L).map(i => (i, i * 1.5)).toDF("k", "qty"), 1L, 6)
    val stores = Map("orders" -> orders, "items" -> items)
    val commits = s"$base/_commits"
    val ckpt = Files.createTempDirectory("graft_lake_linked_ckpt").toString

    val input = MemoryStream[(String, Long, String, Double, String)]
    val changes = input.toDS().toDF("table", "k", "s", "qty", "change_type")
    val query = StreamOps.lakeLinkedMergeStream(changes, stores, commits, "k", ckpt)
    try {
      input.addData(
        ("orders", 5L, "upd_5", 0.0, "update"),
        ("items", 7L, "", 0.0, "delete"))
      query.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits) == Seq(1L, 2L))
      val om = orders.read(2L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(om(5L) == "upd_5" && om.size == 200)
      assert(items.read(2L).count() == 299)
      // linked, not copied: v2 shares pool files with v1 on both tables
      def sharedCount(st: ManifestStore) = {
        val m1 = st.manifest(1L).select("file").as[String].collect().toSet
        val m2 = st.manifest(2L).select("file").as[String].collect().toSet
        (m1 intersect m2).size
      }
      assert(sharedCount(orders) >= 3 && sharedCount(items) >= 5)

      // batch 1 touches ONLY orders: items must advance as a PURE
      // REFERENCE copy (same pool files, no new I/O)
      input.addData(("orders", 10L, "upd_10", 0.0, "update"))
      query.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits) == Seq(1L, 2L, 3L))
      assert(items.manifest(3L).select("file").as[String].collect().toSet ==
        items.manifest(2L).select("file").as[String].collect().toSet)

      // restore targets only marker'd groups
      val g = StreamOps.restoreLinkedGroup(spark, commits, stores, 3L)
      assert(g("orders").count() == 200 && g("items").count() == 299)
    } finally query.stop()

    // crash window: orders reaches v4, the batch dies before items —
    // the group is invisible and a group restore fails fast
    orders.mergeDelta(3L, 4L, Seq((9L, "upd_9")).toDF("k", "s"))
    assert(!StreamOps.groupVersions(spark, commits).contains(4L))
    intercept[IllegalArgumentException] {
      StreamOps.restoreLinkedGroup(spark, commits, stores, 4L)
    }: Unit
  }

  test("lakeMergeStream: one atomic group version per batch; a partial merge stays invisible until the replay completes it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore

    val base = Files.createTempDirectory("graft_lake_cdc").toString
    val orders = new SnapshotStore(spark, s"$base/orders", "k")
    val items = new SnapshotStore(spark, s"$base/items", "k")
    orders.writeRangePartitioned((1L to 200L).map(i => (i, s"o_$i")).toDF("k", "s"), 1L, 4)
    items.writeRangePartitioned((1L to 300L).map(i => (i, i * 1.5)).toDF("k", "qty"), 1L, 6)
    val stores = Map("orders" -> orders, "items" -> items)
    val commits = s"$base/_commits"
    val ckpt = Files.createTempDirectory("graft_lake_cdc_ckpt").toString

    // ONE union-schema feed serves both tables: orders ignores qty,
    // items ignores s (per-table projection from each store's schema)
    val input = MemoryStream[(String, Long, String, Double, String)]
    val changes = input.toDS().toDF("table", "k", "s", "qty", "change_type")
    val query = StreamOps.lakeMergeStream(changes, stores, commits, "k", ckpt)
    try {
      // batch 0 touches BOTH tables → both publish v2 + one marker
      input.addData(
        ("orders", 5L, "upd_5", 0.0, "update"),
        ("orders", 201L, "new_201", 0.0, "insert"),
        ("items", 7L, "", 0.0, "delete"))
      query.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits) == Seq(1L, 2L))
      val o2 = orders.read(2L)
      assert(o2.columns.toSeq == Seq("k", "s"), "qty must not leak into orders")
      val om = o2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(om(5L) == "upd_5" && om(201L) == "new_201" && om.size == 201)
      assert(items.read(2L).columns.toSeq == Seq("k", "qty"))
      assert(items.read(2L).count() == 299)

      // batch 1 touches ONLY orders — items must still advance so the
      // group version is complete (CoW carry, no rows change)
      input.addData(("orders", 10L, "upd_10", 0.0, "update"))
      query.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits) == Seq(1L, 2L, 3L))
      assert(items.read(3L).count() == 299)
      assert(items.versions().contains(3L))
    } finally query.stop()

    // crash window: orders merged to v4 but the batch died before
    // items — the group must stay invisible...
    orders.mergeDelta(3L, 4L, Seq((9L, "upd_9")).toDF("k", "s"))
    assert(orders.versions().contains(4L))
    assert(!StreamOps.groupVersions(spark, commits).contains(4L))
    val e = intercept[IllegalArgumentException] {
      StreamOps.restoreGroup(spark, commits, stores, 4L)
    }
    assert(e.getMessage.contains("not committed"))

    // ...and the replayed batch completes it: orders (already at v4)
    // skips, items merges, the marker lands
    val input2 = MemoryStream[(String, Long, String, Double, String)]
    val q2 = StreamOps.lakeMergeStream(
      input2.toDS().toDF("table", "k", "s", "qty", "change_type"),
      stores, commits, "k", ckpt)
    try {
      // source replays committed batches 0-1 first (skipped), then the
      // in-flight batch 2 = the crash batch's changes
      input2.addData(("orders", 0L, "replay", 0.0, "noop"))
      input2.addData(("orders", 0L, "replay", 0.0, "noop"))
      input2.addData(
        ("orders", 9L, "upd_9", 0.0, "update"),
        ("items", 11L, "", 99.0, "update"))
      q2.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits).contains(4L))
      val g = StreamOps.restoreGroup(spark, commits, stores, 4L)
      val om4 = g("orders").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(om4(9L) == "upd_9" && om4(10L) == "upd_10")
      val im4 = g("items").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(im4(11L) == 99.0 && im4.size == 299)
    } finally q2.stop()
  }

  test("continuousMerge collapses a multi-change batch to the last change per key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore

    val base = Files.createTempDirectory("graft_cmerge_mc").toString
    val store = new SnapshotStore(spark, base, "k")
    store.writeRangePartitioned((1L to 300L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, 6)

    val input = MemoryStream[(Long, String, Long, String)]
    val changes = input.toDS().toDF("k", "s", "seq", "change_type")
    val ckpt = Files.createTempDirectory("graft_cmerge_mc_ckpt").toString
    val query = StreamOps.continuousMerge(changes, store, "k", ckpt, seqCol = Some("seq"))
    try {
      // one batch, three multi-change keys: sequential application must win
      input.addData(
        (5L, "old", 1L, "update"), (5L, "new", 2L, "update"), // update,update → newer
        (7L, "", 1L, "delete"), (7L, "reborn", 2L, "insert"), // delete,insert → reinsert
        (301L, "ghost", 1L, "insert"), (301L, "", 2L, "delete")) // insert,delete → absent
      query.processAllAvailable()
      val v2 = store.read(2L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v2(5L) == "new")
      assert(v2(7L) == "reborn")
      assert(!v2.contains(301L))
      assert(v2.size == 300)
    } finally query.stop()
  }

  test("encrypted chunk ingest: CDC batches land as deduplicated encrypted versioned chunks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import graft.operators.{ChunkCrypto, SnapshotStore}

    val master = Array.tabulate[Byte](32)(_.toByte)
    def common = Array.tabulate(3000)(j => ((j * 31 + 7) % 251).toByte)
    def uniq(i: Int, n: Int = 400) = Array.tabulate(n)(j => ((j * 17 + i * 53) % 251).toByte)
    def payload(i: Int) = common ++ uniq(i)

    val base = Files.createTempDirectory("graft_enc_ingest").toString
    val store = new SnapshotStore(spark, base, "chunk_key")
    val initial = Seq(1, 2, 3, 4).map(i => (i.toLong, payload(i))).toDF("doc_id", "payload")
    StreamOps.writeEncryptedChunkBase(initial, store, "doc_id", "payload", master)

    // convergent dedup on the initial backup: the shared 3000-byte
    // prefix encrypts to identical chunk refs across all 4 payloads
    val v1 = store.read(1L)
    val (rows1, refs1) = (v1.count(), v1.select("ref_hex").distinct().count())
    assert(refs1 < rows1, s"expected ciphertext dedup, got $refs1 distinct of $rows1 rows")

    val input = MemoryStream[(Long, Array[Byte], String)]
    val changes = input.toDS().toDF("doc_id", "payload", "change_type")
    val ckpt = Files.createTempDirectory("graft_enc_ckpt").toString
    val query = StreamOps.encryptedChunkIngest(
      changes, store, "doc_id", "payload", master, ckpt)
    try {
      // batch 0: rewrite doc 2 SHORTER (stale high-index chunks must
      // go), insert doc 5 sharing the common prefix
      input.addData((2L, uniq(99, 600), "update"), (5L, payload(5), "insert"))
      query.processAllAvailable()
      // batch 1: delete doc 3
      input.addData((3L, Array.empty[Byte], "delete"))
      query.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L))

      // restore round trip at the head version — byte-identical
      // payloads, which also proves no stale chunk of doc 2's longer
      // original survived the shrink
      val restored = ChunkCrypto.reassemble(store.read(3L), "doc_id", master)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
      assert(restored.keySet == Set(1L, 2L, 4L, 5L))
      assert(restored(1L) == payload(1).toSeq)
      assert(restored(2L) == uniq(99, 600).toSeq)
      assert(restored(4L) == payload(4).toSeq)
      assert(restored(5L) == payload(5).toSeq)
      assert(store.read(3L).filter(col("doc_id") === 3L).count() == 0L)

      // cross-version dedup: the inserted doc 5's prefix chunks carry
      // the SAME refs as doc 1's (convergent encryption held end-to-end)
      val head = store.read(3L)
      val refs5 = head.filter(col("doc_id") === 5L)
        .select("ref_hex").as[String].collect().toSet
      val refs1h = head.filter(col("doc_id") === 1L)
        .select("ref_hex").as[String].collect().toSet
      assert((refs5 intersect refs1h).nonEmpty)

      // time travel: the pre-delete version still restores doc 3
      val v2docs = ChunkCrypto.reassemble(store.read(2L), "doc_id", master)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
      assert(v2docs(3L) == payload(3).toSeq && v2docs(2L) == uniq(99, 600).toSeq)
    } finally query.stop()
  }

  test("continuousMerge without seqCol fails fast on a duplicate-key batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore

    val base = Files.createTempDirectory("graft_cmerge_dup").toString
    val store = new SnapshotStore(spark, base, "k")
    store.writeRangePartitioned((1L to 50L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, 2)

    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDS().toDF("k", "s", "change_type")
    val ckpt = Files.createTempDirectory("graft_cmerge_dup_ckpt").toString
    val query = StreamOps.continuousMerge(changes, store, "k", ckpt)
    try {
      input.addData((5L, "a", "update"), (5L, "b", "update"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("seqCol")), msgs.mkString(" | "))
      // nothing committed: the store still holds only the base
      assert(store.versions() == Seq(1L))
    } finally query.stop()
  }

  test("late within-watermark event extends session start backward") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val sessions = StreamOps.sessionize(input.toDS(), gapMs = 30 * 60000L)
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions_late").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1L, ts(15), 10L, "click", 1.0), Event(2L, ts(20), 10L, "view", 1.0))
      query.processAllAvailable() // watermark ≈ ts(10)
      // late but within watermark, earlier than current session start
      input.addData(Event(3L, ts(12), 10L, "click", 1.0))
      query.processAllAvailable()
      input.addData(Event(4L, ts(120), 10L, "click", 1.0)) // closes the session
      query.processAllAvailable()
      val closed = spark.sql("SELECT * FROM graft_sessions_late WHERE closed").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("n_events") == 3L)
      assert(closed.head.getAs[Timestamp]("session_start") == ts(12))
    } finally query.stop()
  }

  test("out-of-gap late event becomes its own earlier session, not a merge") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    // gap 10 min, but accept up to 60 min of lateness
    val sessions = StreamOps.sessionize(input.toDS(), gapMs = 10 * 60000L,
      watermarkDelayMs = Some(60 * 60000L))
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions_split").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1L, ts(50), 10L, "click", 1.0), Event(2L, ts(55), 10L, "view", 2.0))
      query.processAllAvailable()
      // 30 min earlier than session start: within watermark but more
      // than one gap away — batch semantics put it in its own session
      input.addData(Event(3L, ts(20), 10L, "click", 4.0))
      query.processAllAvailable()
      input.addData(Event(4L, ts(240), 10L, "click", 8.0)) // closes [50,55]
      query.processAllAvailable()
      val closed = spark.sql(
        "SELECT * FROM graft_sessions_split WHERE closed ORDER BY session_start").collect()
      assert(closed.length == 2)
      assert(closed(0).getAs[Timestamp]("session_start") == ts(20))
      assert(closed(0).getAs[Timestamp]("session_end") == ts(20))
      assert(closed(0).getAs[Long]("n_events") == 1L)
      assert(closed(1).getAs[Timestamp]("session_start") == ts(50))
      assert(closed(1).getAs[Timestamp]("session_end") == ts(55))
      assert(closed(1).getAs[Long]("n_events") == 2L)
      assert(closed(1).getAs[Double]("sum_value") == 3.0)
    } finally query.stop()
  }

  test("within-watermark straggler bridges two sessions across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    // gap 10 min, accept up to 60 min lateness: an early session may
    // NOT be finalized just because a later one appeared — an
    // admissible event can still bridge them from a later batch
    val sessions = StreamOps.sessionize(input.toDS(), gapMs = 10 * 60000L,
      watermarkDelayMs = Some(60 * 60000L))
    val query = sessions.writeStream
      .format("memory").queryName("graft_sessions_bridge").outputMode(OutputMode.Append()).start()
    try {
      // two same-batch sessions 15 min apart (> gap)
      input.addData(Event(1L, ts(85), 10L, "click", 1.0), Event(2L, ts(100), 10L, "view", 2.0))
      query.processAllAvailable()
      // the bridge: 93 is within gap of both 85 and 100
      input.addData(Event(3L, ts(93), 10L, "click", 4.0))
      query.processAllAvailable()
      input.addData(Event(4L, ts(240), 10L, "click", 8.0)) // watermark past the merged session
      query.processAllAvailable()
      val closed = spark.sql(
        "SELECT * FROM graft_sessions_bridge WHERE closed ORDER BY session_start").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Timestamp]("session_start") == ts(85))
      assert(closed.head.getAs[Timestamp]("session_end") == ts(100))
      assert(closed.head.getAs[Long]("n_events") == 3L)
      assert(closed.head.getAs[Double]("sum_value") == 7.0)
    } finally query.stop()
  }

  test("incrementalSnapshot drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamOps.incrementalSnapshot(
      input.toDF().toDF("k", "ts", "v"), "k", "ts")
    val query = deduped.writeStream
      .format("memory").queryName("graft_snap").outputMode(OutputMode.Append()).start()
    try {
      // same key at different timestamps: first writer wins
      input.addData((1L, ts(0), "a"), (1L, ts(1), "a-later"), (2L, ts(1), "b"))
      query.processAllAvailable()
      val rows = spark.sql("SELECT k FROM graft_snap").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(1L, 2L))
    } finally query.stop()
  }

  test("stream-stream funnelJoin pairs purchases with in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val events = input.toDF()
    val joined = StreamOps.funnelJoin(
      events.filter($"event_type" === "click"),
      events.filter($"event_type" === "purchase"))
    val query = joined.writeStream
      .format("memory").queryName("graft_funnel").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, ts(0), 10L, "click", 1.0),
        Event(2L, ts(10), 10L, "purchase", 5.0),  // 10 min after the click: in window
        Event(3L, ts(100), 10L, "purchase", 7.0), // 100 min after: out of window
        Event(4L, ts(5), 20L, "purchase", 9.0))   // other user: no click at all
      query.processAllAvailable()
      val rows = spark.sql("SELECT purchase_id, click_id FROM graft_funnel").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((2L, 1L)))
    } finally query.stop()
  }

  test("funnelJoinOuter emits organic purchases once the watermark expires their state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val events = input.toDF()
    val joined = StreamOps.funnelJoinOuter(
      events.filter($"event_type" === "click"),
      events.filter($"event_type" === "purchase"))
    val query = joined.writeStream
      .format("memory").queryName("graft_funnel_outer").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, ts(0), 10L, "click", 1.0),
        Event(2L, ts(10), 10L, "purchase", 5.0), // attributed
        Event(4L, ts(5), 20L, "purchase", 9.0))  // organic: no click
      query.processAllAvailable()
      // matched row arrives with the batch; the organic one must wait
      val early = spark.sql("SELECT purchase_id FROM graft_funnel_outer").collect()
        .map(_.getLong(0)).toSet
      assert(early == Set(2L))
      // advance the watermark on BOTH sides (the query watermark is
      // the min across the two watermark operators — clicks alone
      // advancing would leave the purchase side, and thus the join
      // state clock, at zero) far past purchase(4)'s window + delay:
      // its state expires and the null-click row flushes next batch
      input.addData(
        Event(9L, ts(300), 30L, "click", 0.0),
        Event(10L, ts(300), 40L, "purchase", 1.0))
      query.processAllAvailable()
      input.addData(
        Event(11L, ts(301), 31L, "click", 0.0),
        Event(12L, ts(301), 41L, "purchase", 1.0))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT purchase_id, click_id FROM graft_funnel_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(rows == Set((2L, Some(1L)), (4L, None)))
    } finally query.stop()
  }

  test("streamingManifest: removes cancel adds in the XOR algebra (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.ManifestChange

    def fp(k: Long): Long = k * 0x9E3779B97F4A7C15L + 1
    def part(k: Long): String = s"p${k % 2}"

    val input = MemoryStream[ManifestChange]
    val mf = StreamOps.streamingManifest(input.toDF(), Seq("part"), "k", "fp", "op")
    val query = mf.writeStream
      .format("memory").queryName("graft_mf").outputMode(OutputMode.Complete()).start()
    try {
      // batch 1: initial backup of keys 1..20
      input.addData((1L to 20L).map(k => ManifestChange(part(k), k, fp(k), "add")): _*)
      query.processAllAvailable()
      // batch 2: day's delta — delete 4 and 6, insert 21 and 22,
      // update 8 (remove old content, add new content)
      input.addData(
        ManifestChange(part(4), 4, fp(4), "remove"),
        ManifestChange(part(6), 6, fp(6), "remove"),
        ManifestChange(part(21), 21, fp(21), "add"),
        ManifestChange(part(22), 22, fp(22), "add"),
        ManifestChange(part(8), 8, fp(8), "remove"),
        ManifestChange(part(8), 8, fp(8) + 99, "add"))
      query.processAllAvailable()

      val got = spark.sql("SELECT * FROM graft_mf").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
      // expected: the batch manifest of the final live rows
      val live = ((1L to 20L).filterNot(Set(4L, 6L)) ++ Seq(21L, 22L))
        .map(k => (part(k), if (k == 8) fp(8) + 99 else fp(k)))
      val expected = live.groupBy(_._1).map { case (p, rows) =>
        p -> ((rows.size.toLong, rows.map(_._2).reduce(_ ^ _)))
      }
      assert(got == expected)
    } finally query.stop()
  }

  test("dailyBars emits explicit zero bars for silent days") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dayMs = 86400000L
    val base = 19676L // day index of the ts() helper's epoch
    def at(day: Long, hourMs: Long) = new Timestamp((base + day) * dayMs + hourMs)
    val input = MemoryStream[Event]
    val query = StreamOps.dailyBars(input.toDS()).writeStream
      .format("memory").queryName("graft_bars").outputMode(OutputMode.Append()).start()
    try {
      // day0: two events; day1: SILENT; day2: one event;
      // day3 event advances the watermark past day2's end
      input.addData(
        Event(1L, at(0, 3600000L), 1L, "m", 1.5),
        Event(2L, at(0, 7200000L), 1L, "m", 2.5),
        Event(3L, at(2, 3600000L), 1L, "m", 4.0))
      query.processAllAvailable()
      input.addData(Event(4L, at(3, 43200000L), 1L, "m", 9.0))
      query.processAllAvailable()
      val bars = spark.sql("SELECT * FROM graft_bars ORDER BY day").collect()
        .map(r => (r.getTimestamp(1).getTime / dayMs - base,
          r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      assert(bars.toSeq == Seq(
        (0L, 2L, 4.0, false),
        (1L, 0L, 0.0, true),   // the silent day IS a row
        (2L, 1L, 4.0, false)))
    } finally query.stop()
  }

  test("dailyBars zero bars keep flowing while the watermark advances on other keys") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dayMs = 86400000L
    val base = 19676L
    def at(day: Long, hourMs: Long) = new Timestamp((base + day) * dayMs + hourMs)
    val input = MemoryStream[Event]
    val query = StreamOps.dailyBars(input.toDS()).writeStream
      .format("memory").queryName("graft_bars2").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1L, at(0, 3600000L), 1L, "dead", 1.0),
        Event(2L, at(0, 3600000L), 1L, "live", 1.0))
      query.processAllAvailable()
      // only the live type gets events, three days later
      input.addData(Event(3L, at(3, 43200000L), 1L, "live", 1.0))
      query.processAllAvailable()
      val dead = spark.sql(
        "SELECT day, n, filled FROM graft_bars2 WHERE event_type = 'dead' ORDER BY day")
        .collect().map(r => (r.getTimestamp(0).getTime / dayMs - base, r.getLong(1)))
      // the dead type still reports day0 (real) and days 1-2 (zeros)
      assert(dead.toSeq == Seq((0L, 1L), (1L, 0L), (2L, 0L)))
    } finally query.stop()
  }

  private def runAnomaly(name: String, batches: Seq[Seq[Event]]): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = StreamOps.runningAnomaly(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.sql(s"SELECT event_id FROM $name").collect().map(_.getLong(0)).toSet
    } finally query.stop()
  }

  test("runningAnomaly flags a spike against the prior baseline only") {
    val flat = (0 until 20).map(i => Event(i.toLong, ts(i), 1L, "m", 10.0 + (i % 2)))
    val spike = Event(100L, ts(30), 1L, "m", 500.0)
    val after = Event(101L, ts(31), 1L, "m", 10.5)
    val got = runAnomaly("graft_anom1", Seq(flat, Seq(spike, after)))
    assert(got == Set(100L), s"only the spike should flag, got $got")
  }

  test("runningAnomaly needs a minimum baseline before flagging") {
    // a spike among the first 10 observations must not flag
    val early = (0 until 8).map(i => Event(i.toLong, ts(i), 1L, "m", 10.0)) :+
      Event(99L, ts(8), 1L, "m", 500.0)
    assert(runAnomaly("graft_anom2", Seq(early)).isEmpty)
  }

  test("runningAnomaly is batch-split invariant on an ordered feed") {
    val evs = (0 until 30).map(i =>
      Event(i.toLong, ts(i), 1L, "m", if (i == 25) 400.0 else 10.0 + (i % 3))) ++
      (0 until 30).map(i =>
        Event(100L + i, ts(i), 1L, "other", if (i == 28) -300.0 else 5.0 + (i % 2)))
    val one = runAnomaly("graft_anom3a", Seq(evs.sortBy(_.ts.getTime)))
    val three = runAnomaly("graft_anom3b",
      evs.sortBy(_.ts.getTime).grouped(20).toSeq)
    assert(one == three)
    assert(one == Set(25L, 128L))
  }

  test("redactStream erases queued ids from every repository version; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ChunkStore
    val master = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    val base = Files.createTempDirectory("graft_redact_stream").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 4)
    def pay(s: String) = s.getBytes("UTF-8")
    def body(seed: Int) = (0 until 40).map(i => s"blk-$seed-$i").mkString(" ")
    store.backup((1L to 4L).map(i => (i, pay(body(i.toInt)))).toDF("id", "payload"),
      "id", "payload", 1L, commitTs = Some(1000L))
    store.backup((1L to 5L).map(i => (i, pay(body(i.toInt)))).toDF("id", "payload"),
      "id", "payload", 2L, commitTs = Some(2000L))
    val ckpt = Files.createTempDirectory("graft_redact_stream_ckpt").toString
    val input = MemoryStream[Long]
    val mk = (in: MemoryStream[Long]) =>
      StreamOps.redactStream(in.toDS().toDF("id"), Seq(store), ckpt)
    val q1 = mk(input)
    try {
      input.addData(2L)
      q1.processAllAvailable()
      input.addData(4L, 4L) // duplicate requests in one batch collapse
      q1.processAllAvailable()
    } finally q1.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0)).toSet
    assert(canon(store.restore(1L).select("id")) == Set(1L, 3L))
    assert(canon(store.restore(2L).select("id")) == Set(1L, 3L, 5L))
    assert(canon(store.restoreAsOf(1500L).select("id")) == Set(1L, 3L))
    // replay (fresh query, same checkpoint, same data re-fed): redact
    // no-ops — nothing further disappears, repository stays healthy
    val input2 = MemoryStream[Long]
    val q2 = mk(input2)
    try {
      input2.addData(2L)
      input2.addData(4L)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(canon(store.restore(2L).select("id")) == Set(1L, 3L, 5L))
    assert(store.scrub().filter(
      org.apache.spark.sql.functions.col("status") =!= "ok").count() == 0)
  }

  test("chunkBackupStream in-stream bucket compaction bounds file counts; every version keeps restoring") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ChunkStore
    val master = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    val base = Files.createTempDirectory("graft_chunk_autoc").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 2)
    def pay(s: String) = s.getBytes("UTF-8")
    def body(seed: Int) = (0 until 40).map(i => s"blk-$seed-$i").mkString(" ")
    store.backup(Seq((1L, pay(body(1)))).toDF("id", "payload"), "id", "payload", 1L)
    val input = MemoryStream[(Long, Array[Byte], String)]
    val query = StreamOps.chunkBackupStream(
      input.toDS().toDF("id", "payload", "change_type"),
      store, Files.createTempDirectory("graft_chunk_autoc_ckpt").toString,
      autoCompactMaxFiles = Some(3))
    try {
      (2 to 6).foreach { i =>
        input.addData((i.toLong, pay(body(i)), "insert"))
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(store.versions() == (1L to 6L))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesPerBucket = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/chunks"))
      .filter(_.getPath.getName.startsWith("bucket=")).map(d =>
        fs.listStatus(d.getPath).count(_.getPath.getName.startsWith("part-")))
    // without compaction each bucket would hold ~6 append sets; the
    // in-stream fold keeps every bucket at or under threshold + 1
    // (the batch that lands right after a fold)
    assert(filesPerBucket.forall(_ <= 4), s"bucket files: ${filesPerBucket.toList}")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    (1 to 6).foreach { v =>
      assert(canon(store.restore(v.toLong)) ==
        (1 to v).map(i => i.toLong -> pay(body(i)).toSeq).toMap)
    }
    assert(store.scrub()
      .filter(org.apache.spark.sql.functions.col("status") =!= "ok").count() == 0)
  }

  test("lakeChunkBackupStream: one atomic group version across repositories; a partial backup stays invisible until the replay completes it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.ChunkStore

    val master = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    val base = Files.createTempDirectory("graft_lake_chunk").toString
    val orders = new ChunkStore(spark, s"$base/orders", master, nBuckets = 4)
    val items = new ChunkStore(spark, s"$base/items", master, nBuckets = 4)
    def pay(s: String) = s.getBytes("UTF-8")
    def body(seed: String) = (0 until 40).map(i => s"blk-$seed-$i").mkString(" ")
    orders.backup(Seq((1L, pay(body("o1"))), (2L, pay(body("o2"))))
      .toDF("id", "payload"), "id", "payload", 1L)
    items.backup(Seq((1L, pay(body("i1"))), (2L, pay(body("i2"))))
      .toDF("id", "payload"), "id", "payload", 1L)
    val stores = Map("orders" -> orders, "items" -> items)
    val commits = s"$base/_commits"
    val ckpt = Files.createTempDirectory("graft_lake_chunk_ckpt").toString

    val input = MemoryStream[(String, Long, Array[Byte], String)]
    val mk = (in: MemoryStream[(String, Long, Array[Byte], String)]) =>
      StreamOps.lakeChunkBackupStream(
        in.toDS().toDF("table", "id", "payload", "change_type"),
        stores, commits, ckpt)
    val query = mk(input)
    try {
      // batch 0 touches BOTH repositories → both publish v2 + 1 marker
      input.addData(
        ("orders", 1L, pay("EDITED " + body("o1")), "update"),
        ("items", 3L, pay(body("i3")), "insert"))
      query.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits) == Seq(1L, 2L))
      // batch 1 touches ONLY orders — items' repository must still
      // advance so the group version is complete
      input.addData(("orders", 2L, Array.empty[Byte], "delete"))
      query.processAllAvailable()
      assert(StreamOps.groupVersions(spark, commits) == Seq(1L, 2L, 3L))
      assert(items.versions() == Seq(1L, 2L, 3L))
    } finally query.stop()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val g3 = StreamOps.restoreChunkGroup(spark, commits, stores, 3L)
    assert(canon(g3("orders")) == Map(1L -> pay("EDITED " + body("o1")).toSeq))
    assert(canon(g3("items")) == Map(1L -> pay(body("i1")).toSeq,
      2L -> pay(body("i2")).toSeq, 3L -> pay(body("i3")).toSeq))

    // crash window: orders' repository committed v4 but the batch died
    // before items — the group must stay invisible...
    orders.backupDelta(3L, 4L,
      Seq((5L, pay(body("o5")))).toDF("id", "payload"),
      Seq.empty[Long].toDF("id"), "id", "payload")
    assert(orders.versions().contains(4L))
    assert(!StreamOps.groupVersions(spark, commits).contains(4L))
    val e = intercept[IllegalArgumentException] {
      StreamOps.restoreChunkGroup(spark, commits, stores, 4L)
    }
    assert(e.getMessage.contains("not committed"))

    // ...and the replayed batch completes it: orders (already at v4)
    // skips on its committed manifest, items backs up, the marker lands
    val input2 = MemoryStream[(String, Long, Array[Byte], String)]
    val q2 = mk(input2)
    try {
      input2.addData(("orders", 0L, pay("x"), "noop"))  // replayed batch 0
      input2.addData(("orders", 0L, pay("x"), "noop"))  // replayed batch 1
      input2.addData(
        ("orders", 5L, pay(body("o5")), "insert"),
        ("items", 2L, Array.empty[Byte], "delete"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(StreamOps.groupVersions(spark, commits).contains(4L))
    val g4 = StreamOps.restoreChunkGroup(spark, commits, stores, 4L)
    assert(canon(g4("orders")) == Map(1L -> pay("EDITED " + body("o1")).toSeq,
      5L -> pay(body("o5")).toSeq))
    assert(canon(g4("items")) == Map(1L -> pay(body("i1")).toSeq,
      3L -> pay(body("i3")).toSeq))

    // group-wide retention: retire v1-v2 everywhere; markers go FIRST
    // (a crash mid-prune must never leave a marker'd version some
    // repository already swept), survivors restore byte-identical
    val pruned = StreamOps.pruneChunkGroup(spark, commits, stores, keep = Seq(3L, 4L))
    assert(pruned("orders")._1 == Seq(1L, 2L) && pruned("items")._1 == Seq(1L, 2L))
    // orders reclaims (o1-original + o2 chunks are in no survivor);
    // items reclaims nothing — its retired manifests are subsets of
    // surviving v3, exactly the dedup model's promise
    assert(pruned("orders")._2 > 0 && pruned("items")._2 == 0L)
    assert(StreamOps.groupVersions(spark, commits) == Seq(3L, 4L))
    val g4b = StreamOps.restoreChunkGroup(spark, commits, stores, 4L)
    assert(canon(g4b("orders")) == canon(g4("orders")))
    assert(canon(g4b("items")) == canon(g4("items")))
    intercept[IllegalArgumentException](
      StreamOps.restoreChunkGroup(spark, commits, stores, 2L))
  }

  test("lakeMergeStream: a failed group-marker publish fails the batch; the replay lands it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotStore
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyRenameFs].getName)
    val base = Files.createTempDirectory("graft_lake_marker").toString
    val orders = new SnapshotStore(spark, s"$base/orders", "k")
    val items = new SnapshotStore(spark, s"$base/items", "k")
    orders.writeRangePartitioned((1L to 50L).map(i => (i, s"o_$i")).toDF("k", "s"), 1L, 2)
    items.writeRangePartitioned((1L to 50L).map(i => (i, i * 1.5)).toDF("k", "qty"), 1L, 2)
    val stores = Map("orders" -> orders, "items" -> items)
    // group-commit dir behind the fault-injecting scheme: rename to
    // marker "2" fails ONCE — an object store's failed atomic publish
    val commits = s"faulty:$base/_commits"
    val ckpt = Files.createTempDirectory("graft_lake_marker_ckpt").toString
    val input = MemoryStream[(String, Long, String, Double, String)]
    val query = StreamOps.lakeMergeStream(
      input.toDS().toDF("table", "k", "s", "qty", "change_type"),
      stores, commits, "k", ckpt)
    FaultyRenameFs.failOnDstName = Some("2")
    val failed = try {
      input.addData(("orders", 5L, "upd_5", 0.0, "update"))
      query.processAllAvailable()
      false
    } catch { case _: Throwable => true } finally query.stop()
    // the batch must FAIL — a swallowed publish error would commit the
    // checkpoint with version 2 permanently invisible to group readers
    assert(failed, "batch with failed marker publish must fail the query")
    assert(orders.versions().contains(2L) && items.versions().contains(2L))
    assert(!StreamOps.groupVersions(spark, commits).contains(2L))
    // replay: both stores skip (already at v2), the marker publishes
    val input2 = MemoryStream[(String, Long, String, Double, String)]
    val q2 = StreamOps.lakeMergeStream(
      input2.toDS().toDF("table", "k", "s", "qty", "change_type"),
      stores, commits, "k", ckpt)
    try {
      input2.addData(("orders", 5L, "upd_5", 0.0, "update"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(StreamOps.groupVersions(spark, commits).contains(2L))
    val g = StreamOps.restoreGroup(spark, commits, stores, 2L)
    assert(g("orders").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      .apply(5L) == "upd_5")
  }

  test("userPathStream finalizes the opening prefix once the watermark passes it, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val paths = StreamOps.userPathStream(input.toDS(), steps = 3,
      watermarkDelay = "10 minutes")
    val query = paths.writeStream
      .format("memory").queryName("graft_upath").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 10's events arrive OUT OF ORDER; user 20 has
      // only 2 events (short history — must never emit)
      input.addData(
        Event(5L, ts(8), 10L, "purchase", 1.0),
        Event(1L, ts(0), 10L, "view", 1.0),
        Event(4L, ts(1), 20L, "click", 1.0), Event(6L, ts(2), 20L, "view", 1.0))
      query.processAllAvailable()
      assert(spark.table("graft_upath").isEmpty) // watermark hasn't passed yet
      // batch 2: a within-watermark straggler at the SAME ts as event 5
      // but a smaller event_id — must displace it in the prefix order
      input.addData(Event(2L, ts(8), 10L, "click", 1.0))
      query.processAllAvailable()
      // batch 3: far-future event advances the watermark past ts(8)
      input.addData(Event(99L, ts(600), 30L, "flush", 0.0))
      query.processAllAvailable()
      val out = spark.table("graft_upath").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      assert(out.toSeq == Seq(10L -> (("view>click>purchase", 3))))
      // equal to the batch operator's prefix for the full-history user
      val batch = graft.operators.Events.userPaths(
        Seq((1L, ts(0), 10L, "view"), (2L, ts(8), 10L, "click"),
          (5L, ts(8), 10L, "purchase"))
          .toDF("event_id", "ts", "user_id", "event_type"), 3, 10)
        .collect().head.getString(0)
      assert(batch == "view>click>purchase")
      // batch 4: post-finalization stragglers never re-emit a path
      input.addData(Event(7L, ts(610), 10L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Event(98L, ts(1200), 30L, "flush", 0.0))
      query.processAllAvailable()
      assert(spark.table("graft_upath").count() == 1L)
    } finally query.stop()
  }

  test("asofStream matches batch asofJoin for within-watermark arrivals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    val query = StreamOps.asofStream(lefts.toDS(), rights.toDS())
      .writeStream.format("memory").queryName("graft_asof")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a right and two lefts for user 10 — left t=10 is NOT
      // emitted yet (wm still behind it on this batch's entry). The
      // global watermark is the MIN across both input streams, so the
      // right side carries a t=60 pacer (user 88, matches nothing).
      rights.addData(Event(100L, ts(0), 10L, "quote", 100.0),
        Event(900L, ts(60), 88L, "quote", 0.0))
      lefts.addData(Event(1L, ts(10), 10L, "trade", 1.0),
        Event(3L, ts(55), 10L, "trade", 3.0))
      query.processAllAvailable()
      // batch 2 (wm = min(55, 60)−30 = 25): left t=10 settles against
      // right t=0 even though a LATER right (t=50) arrives in this
      // very batch; the new left t=50 and user-20 left stay pending
      rights.addData(Event(101L, ts(50), 10L, "quote", 105.0))
      lefts.addData(Event(2L, ts(50), 10L, "trade", 2.0),
        Event(4L, ts(30), 20L, "trade", 4.0))
      query.processAllAvailable()
      val early = spark.table("graft_asof").collect()
      assert(early.map(_.getAs[Long]("event_id")).toSet == Set(1L),
        s"only the finalized left may emit, got ${early.mkString(",")}")
      // batch 3: watermark flush on BOTH streams — everything settles
      lefts.addData(Event(99L, ts(200), 77L, "trade", 0.0))
      rights.addData(Event(901L, ts(200), 88L, "quote", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_asof").collect()
        .map(r => r.getAs[Long]("event_id") ->
          (Option(r.getAs[Timestamp]("asof_ts")), Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)))
        .toMap
      // batch-operator oracle on the same (settled) events
      val leftDf = Seq((1L, ts(10), 10L, 1.0), (2L, ts(50), 10L, 2.0),
        (3L, ts(55), 10L, 3.0), (4L, ts(30), 20L, 4.0))
        .toDF("event_id", "ts", "user_id", "value")
      val rightDf = Seq((ts(0), 10L, 100.0), (ts(50), 10L, 105.0))
        .toDF("ts", "user_id", "rv")
      val expected = graft.operators.AsofJoin.asofJoin(
        leftDf, rightDf, "user_id", "ts", "ts", Seq("rv"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_rv")).map(_.toDouble)).toMap
      assert(got.keySet == Set(1L, 2L, 3L, 4L))
      expected.foreach { case (id, rv) =>
        assert(got(id)._2 == rv, s"event $id: stream ${got(id)._2} vs batch $rv")
      }
      // inclusive equal-ts semantics + the no-match null
      assert(got(2L) == (Some(ts(50)), Some(105.0)))
      assert(got(4L) == (None, None))
    } finally query.stop()
  }

  test("asofStream tolerance nulls a stale match like the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    val query = StreamOps.asofStream(lefts.toDS(), rights.toDS(),
        toleranceMs = Some(15L * 60000L))
      .writeStream.format("memory").queryName("graft_asof_tol")
      .outputMode(OutputMode.Append()).start()
    try {
      rights.addData(Event(100L, ts(0), 30L, "quote", 100.0))
      lefts.addData(Event(1L, ts(10), 30L, "trade", 1.0), // 10 min — in tol
        Event(2L, ts(40), 30L, "trade", 2.0))             // 40 min — stale
      query.processAllAvailable()
      lefts.addData(Event(99L, ts(300), 77L, "trade", 0.0))
      rights.addData(Event(901L, ts(300), 88L, "quote", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_asof_tol").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
      assert(got(1L) == Some(100.0))
      assert(got(2L) == None, "out-of-tolerance match must null, not attach")
    } finally query.stop()
  }

  test("asofStreamForward matches batch forward asofJoin; unmatched probes finalize at lts+tol") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    val tol = 20L * 60000L
    val query = StreamOps.asofStreamForward(lefts.toDS(), rights.toDS(), tol)
      .writeStream.format("memory").queryName("graft_asof_fwd")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 10: left t=10 → earliest right at-or-after is t=15 (in
      // tol); left t=40 → right t=70 exists but is beyond tol → null;
      // user 20: no rights at all → null at finalization
      rights.addData(Event(100L, ts(15), 10L, "quote", 115.0),
        Event(101L, ts(70), 10L, "quote", 170.0))
      lefts.addData(Event(1L, ts(10), 10L, "trade", 1.0),
        Event(2L, ts(40), 10L, "trade", 2.0),
        Event(3L, ts(35), 20L, "trade", 3.0))
      query.processAllAvailable()
      lefts.addData(Event(99L, ts(300), 77L, "trade", 0.0))
      rights.addData(Event(901L, ts(300), 88L, "quote", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_asof_fwd").collect()
        .map(r => r.getAs[Long]("event_id") ->
          (Option(r.getAs[Timestamp]("asof_ts")),
            Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))).toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got(1L) == (Some(ts(15)), Some(115.0)))
      assert(got(2L) == (None, None), "beyond-tolerance right must not attach")
      assert(got(3L) == (None, None))
      // batch-operator parity on the same events
      val leftDf = Seq((1L, ts(10), 10L), (2L, ts(40), 10L), (3L, ts(35), 20L))
        .toDF("event_id", "ts", "user_id")
      val rightDf = Seq((ts(15), 10L, 115.0), (ts(70), 10L, 170.0))
        .toDF("ts", "user_id", "rv")
      val expected = graft.operators.AsofJoin.asofJoin(
        leftDf, rightDf, "user_id", "ts", "ts", Seq("rv"),
        tolerance = Some(org.apache.spark.sql.functions.expr(
          s"INTERVAL ${tol / 1000} SECONDS")), forward = true)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_rv")).map(_.toDouble)).toMap
      expected.foreach { case (id, rv) =>
        assert(got(id)._2 == rv, s"event $id: stream ${got(id)._2} vs batch $rv")
      }
    } finally query.stop()
  }

  test("asofStreamForward early-finalizes a matched probe once the watermark passes its candidate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    // huge tolerance: finality must come from the matched-candidate
    // rule (wm ≥ rts), NOT from lts+tol
    val query = StreamOps.asofStreamForward(lefts.toDS(), rights.toDS(),
        toleranceMs = 10L * 3600000L)
      .writeStream.format("memory").queryName("graft_asof_fwd2")
      .outputMode(OutputMode.Append()).start()
    try {
      rights.addData(Event(100L, ts(20), 30L, "quote", 120.0))
      lefts.addData(Event(1L, ts(10), 30L, "trade", 1.0))
      query.processAllAvailable()
      // advance wm just past the candidate (wm = 60−30 = 30 ≥ 20):
      // the match is final long before lts + tol
      lefts.addData(Event(98L, ts(60), 77L, "trade", 0.0))
      rights.addData(Event(901L, ts(60), 88L, "quote", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_asof_fwd2").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
      assert(got.get(1L).contains(Some(120.0)),
        s"matched probe must finalize at wm ≥ candidate rts, got $got")
    } finally query.stop()
  }

  test("asofStream settled-right compaction keeps only the dominant right") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    val query = StreamOps.asofStream(lefts.toDS(), rights.toDS())
      .writeStream.format("memory").queryName("graft_asof_comp")
      .outputMode(OutputMode.Append()).start()
    try {
      // two rights, then a both-stream flush pushes them below the
      // watermark — state compacts them to ONE settled right (t=20)
      rights.addData(Event(100L, ts(0), 40L, "quote", 1.0),
        Event(101L, ts(20), 40L, "quote", 2.0))
      lefts.addData(Event(98L, ts(100), 79L, "trade", 0.0))
      rights.addData(Event(102L, ts(100), 41L, "quote", 9.0))
      query.processAllAvailable()
      // a much later left must still match the compacted right
      lefts.addData(Event(1L, ts(150), 40L, "trade", 1.0))
      query.processAllAvailable()
      lefts.addData(Event(99L, ts(400), 77L, "trade", 0.0))
      rights.addData(Event(902L, ts(400), 88L, "quote", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_asof_comp").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
      assert(got(1L) == Some(2.0),
        "compaction must keep the LATEST settled right, not drop it")
    } finally query.stop()
  }

  test("asofStream idleKeyTtl reclaims a quiet key's settled state; a late probe reads null") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    // TTL = 60 min of event time: once the watermark passes a quiet
    // key's newest right by an hour, its settled element drops
    val query = StreamOps.asofStream(lefts.toDS(), rights.toDS(),
        idleKeyTtlMs = Some(60L * 60000L))
      .writeStream.format("memory").queryName("graft_asof_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      // key 40 gets one right at t=0, then goes quiet
      rights.addData(Event(100L, ts(0), 40L, "quote", 2.0))
      lefts.addData(Event(98L, ts(100), 79L, "trade", 0.0))
      rights.addData(Event(900L, ts(100), 88L, "quote", 0.0))
      query.processAllAvailable()
      // wm ≈ 70 min: settled.ts(0) + ttl(60) ≤ wm → the idle timeout
      // fires on the next batch and key 40's state drops
      lefts.addData(Event(97L, ts(110), 79L, "trade", 0.0))
      rights.addData(Event(901L, ts(110), 88L, "quote", 0.0))
      query.processAllAvailable()
      // a late probe for key 40 now reads NULL — the historical right
      // was reclaimed (the documented TTL trade)
      lefts.addData(Event(1L, ts(150), 40L, "trade", 1.0))
      query.processAllAvailable()
      lefts.addData(Event(99L, ts(400), 77L, "trade", 0.0))
      rights.addData(Event(902L, ts(400), 88L, "quote", 0.0))
      query.processAllAvailable()
      val got = spark.table("graft_asof_ttl").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
      assert(got(1L).isEmpty,
        s"TTL-reclaimed key must probe null, got ${got(1L)}")
    } finally query.stop()
  }

  test("pagerankStream: ranks track the live edge set; final version equals batch pagerank") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import graft.operators.{Graph, SnapshotStore}
    val base = Files.createTempDirectory("graft_pr_stream").toString
    val store = new SnapshotStore(spark, s"$base/edges", "edge_id")
    // K4 on a..d plus pendant d-e (edge_id keys the CoW merges)
    val v1 = Seq((1L, "a", "b"), (2L, "a", "c"), (3L, "a", "d"),
      (4L, "b", "c"), (5L, "b", "d"), (6L, "c", "d"), (7L, "d", "e"))
      .toDF("edge_id", "src", "dst")
    store.writeRangePartitioned(v1, 1L, 2)
    val ranksBase = s"$base/ranks"
    val input = MemoryStream[(Long, String, String, String)]
    val query = StreamOps.pagerankStream(
      input.toDS().toDF("edge_id", "src", "dst", "change_type"),
      store, ranksBase, Files.createTempDirectory("graft_pr_ckpt").toString, iters = 4)
    try {
      // batch 0: attach f to the pendant, delete one K4 edge
      input.addData((8L, "e", "f", "insert"), (4L, "", "", "delete"))
      query.processAllAvailable()
      // batch 1: rewire edge 7 from d-e to c-e (update through the key)
      input.addData((7L, "c", "e", "update"))
      query.processAllAvailable()
      assert(store.versions() == Seq(1L, 2L, 3L))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toList
      for (v <- Seq(2L, 3L)) {
        val e = store.read(v).select("src", "dst")
        val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        val batchRanks = Graph.pagerank(sym, 4, 1000000000000L)
        val streamed = spark.read.parquet(s"$ranksBase/v=$v")
        assert(canon(streamed) == canon(batchRanks), s"version $v ranks diverge")
      }
      // the rewire must actually move ranks (c gains e's contribution)
      val r2 = spark.read.parquet(s"$ranksBase/v=2").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val r3 = spark.read.parquet(s"$ranksBase/v=3").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r3("c") > r2("c") && r3("d") < r2("d"))
    } finally query.stop()
  }
}

/** Test-only local FS whose rename can be armed to fail ONCE for a
  * given destination name — simulates an object store's failed atomic
  * publish without mocking anything in the code under test. */
class FaultyRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (FaultyRenameFs.failOnDstName.contains(dst.getName)) {
      FaultyRenameFs.failOnDstName = None
      false
    } else super.rename(src, dst)
}
object FaultyRenameFs {
  @volatile var failOnDstName: Option[String] = None
}
