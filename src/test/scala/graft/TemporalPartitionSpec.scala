package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{ManifestStore, SnapshotStore}

/** TEMPORAL PARTITION TRANSFORMS — `PARTITIONED BY days(ts)` /
  * `months(ts)`: the sidecar records the transform, every landing
  * derives the identity column (`ts__day`/`ts__month`), the existing
  * one-tuple-per-file machinery prunes/drops on it, and SQL hides it
  * from SELECT *. */
class TemporalPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def days(n: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))

  test("store API: months(d) partitions both layouts — derived col lands, exact prune, metadata drop, merge keeps the invariant") {
    val root = java.nio.file.Files.createTempDirectory("graft_tp").toString
    val df = (1 to 120).map(i => (i.toLong, days(i), i * 1.0)).toDF("k", "d", "x")
    for (layout <- Seq("linked", "snapshot")) {
      val base = s"$root/$layout"
      def lk = new ManifestStore(spark, base, "k")
      def sn = new SnapshotStore(spark, base, "k")
      if (layout == "linked") lk.writePartitioned(df, 1L, Seq("months(d)"))
      else sn.writePartitioned(df, 1L, Seq("months(d)"))
      val read1 = if (layout == "linked") lk.read(1L) else sn.read(1L)
      // the derived identity column landed (visible at store level)
      assert(read1.columns.contains("d__month"), layout)
      assert(read1.count() == 120)
      // partition listing keys on the derived column — 2024-01..2024-05
      val parts = (if (layout == "linked") lk.partitions(1L) else sn.partitions(1L))
        .collect().map(r => (r.getDate(0).toString, r.getLong(2))).toMap
      assert(parts.keySet == Set("2024-01-01", "2024-02-01", "2024-03-01",
        "2024-04-01"), s"$layout: $parts")
      assert(parts.values.sum == 120L)
      // EXACT PRUNE GATE: a one-month read opens exactly that month's files
      val feb = Date.valueOf("2024-02-01")
      val (opened, partFiles) =
        if (layout == "linked") (
          lk.manifest(1L).filter(col("max_d__month") >= feb && col("min_d__month") <= feb).count(),
          lk.manifest(1L).filter(col("min_d__month") === feb).count())
        else (
          sn.prunedFilesBy(1L, "d__month", feb, feb).get.size.toLong,
          sn.partitions(1L).filter(col("d__month") === feb).head().getLong(1))
      assert(opened == partFiles, s"$layout: opened $opened != partition's $partFiles")
      val febRows = (if (layout == "linked") lk.readWhere(1L, "d__month", feb, feb)
        else sn.readWhere(1L, "d__month", feb, feb)).count()
      assert(febRows == df.filter(trunc(col("d"), "month") === feb).count(), layout)
      // a MERGE preserves the invariant (derived col re-lands on new files)
      val delta = Seq((200L, days(35), 5.0)).toDF("k", "d", "x") // lands in February
      if (layout == "linked") lk.mergeDelta(1L, 2L, delta)
      else sn.mergeDelta(2L /* versions() max is 1 */ - 1L, 2L, delta): Unit
      val parts2 = (if (layout == "linked") lk.partitions(2L) else sn.partitions(2L))
        .filter(col("d__month") === feb).head().getLong(2)
      assert(parts2 == febRows + 1, s"$layout: merged row missing from February")
      // DROP the February partition by its derived value
      val dropped =
        if (layout == "linked") lk.dropPartitions(2L, 3L, col("d__month") === feb)
        else sn.dropPartitions(2L, 3L, col("d__month") === feb)
      assert(dropped._3 == febRows + 1, layout)
      val left = if (layout == "linked") lk.read(3L) else sn.read(3L)
      assert(left.filter(trunc(col("d"), "month") === feb).count() == 0, layout)
      // the transform's SOURCE column is pinned like a partition column
      val e = intercept[Exception] {
        if (layout == "linked") lk.renameColumn(3L, 4L, "d", "dd")
        else sn.renameColumn(3L, 4L, "d", "dd")
      }
      assert(e.getMessage.contains("partition"), s"$layout: ${e.getMessage}")
    }
  }

  test("SQL: CREATE TABLE PARTITIONED BY (days(ts)) — hidden column, .partitions, prune-exact read, drop by day") {
    val root = java.nio.file.Files.createTempDirectory("graft_tp_sql").toString
    spark.conf.set("spark.sql.catalog.tpcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.tpcat.root", root)
    for (layout <- Seq("snapshot", "linked")) {
      val t = s"tpcat.ev_$layout"
      spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP, x DOUBLE) " +
        s"PARTITIONED BY (days(ts)) TBLPROPERTIES('key'='k', 'layout'='$layout')")
      spark.sql(s"INSERT INTO $t VALUES " +
        "(1, TIMESTAMP'2024-03-01 10:00:00', 1.0), " +
        "(2, TIMESTAMP'2024-03-01 23:59:59', 2.0), " +
        "(3, TIMESTAMP'2024-03-02 00:00:01', 3.0), " +
        "(4, TIMESTAMP'2024-03-03 12:00:00', 4.0)")
      // SELECT * hides the derived column (Iceberg's hidden partitioning)
      assert(spark.sql(s"SELECT * FROM $t").columns.toSeq == Seq("k", "ts", "x"), layout)
      assert(spark.sql(s"SELECT * FROM $t").count() == 4, layout)
      // .partitions lists the derived day tuples, metadata-only
      val parts = spark.sql(s"SELECT * FROM $t.partitions").collect()
        .map(r => (r.getDate(0).toString, r.getLong(2))).toMap
      assert(parts == Map("2024-03-01" -> 2L, "2024-03-02" -> 1L, "2024-03-03" -> 1L),
        s"$layout: $parts")
      // a day-bounded predicate reads exactly the day's rows
      assert(spark.sql(
        s"SELECT SUM(x) FROM $t WHERE ts >= TIMESTAMP'2024-03-01 00:00:00' " +
          "AND ts < TIMESTAMP'2024-03-02 00:00:00'").head().getDouble(0) == 3.0, layout)
      // drop one day by the derived column
      spark.sql(s"CALL tpcat.drop_partitions('ev_$layout', 'ts__day', '2024-03-01')")
        .collect(): Unit
      assert(spark.sql(s"SELECT k FROM $t").collect().map(_.getLong(0)).toSet
        == Set(3L, 4L), layout)
    }
  }
}
