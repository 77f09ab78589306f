package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ManifestStore, SnapshotStore}

/** Partition SPEC EVOLUTION (Iceberg's headline feature): the
  * `_partition.json` sidecar holds a VERSIONED spec list (id = index)
  * plus the current id; `evolvePartitionSpec` / `CALL
  * set_partition_spec` is ONE metadata write — no data byte moves.
  * Files keep pruning through the spec they were written under (their
  * per-file spec id + that spec's derived-tuple stats, translated to
  * source intervals); old+new-spec files coexist and BOTH prune
  * exactly; whole-partition verbs (drop/replace/partitions) REFUSE on
  * mixed versions honestly; a full compact re-lands everything under
  * the current spec and re-enables them. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** 3 January days + 1 February day, keys disjoint per day. */
  private def seed: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-01 11:00:00"), 2.0),
    (3L, ts("2024-01-02 10:00:00"), 3.0), (4L, ts("2024-01-02 11:00:00"), 4.0),
    (5L, ts("2024-01-03 10:00:00"), 5.0),
    (6L, ts("2024-02-01 10:00:00"), 6.0), (7L, ts("2024-02-01 11:00:00"), 7.0)
  ).toDF("k", "ts", "v")

  /** March rows, keys far outside the seed envelopes (no file touch). */
  private def march: DataFrame = Seq(
    (100L, ts("2024-03-05 10:00:00"), 100.0),
    (101L, ts("2024-03-20 10:00:00"), 101.0)
  ).toDF("k", "ts", "v")

  private def files(df: DataFrame): Set[String] =
    df.inputFiles.map(_.split('/').last).toSet

  test("linked: evolve days->months, both eras prune exactly, drop refuses, compact unifies") {
    val base = java.nio.file.Files.createTempDirectory("graft_pe_lk").toString + "/t"
    val st = new ManifestStore(spark, base, "k", statsCols = Seq("v"))
    st.writePartitioned(seed, 1L, Seq("days(ts)"))
    // v1 sidecar back-compat: the pre-evolution format reads as ONE
    // spec, id 0, current 0
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotStore.readPartitionSpecHistory(fs, base) ==
      (Seq(Seq("days(ts)")), 0))
    assert(st.evolvePartitionSpec(Seq("months(ts)")) == 1)
    assert(SnapshotStore.readPartitionSpecHistory(fs, base) ==
      (Seq(Seq("days(ts)"), Seq("months(ts)")), 1))
    // idempotent; and re-activating an identical earlier spec REUSES
    // its id instead of minting a duplicate
    assert(st.evolvePartitionSpec(Seq("months(ts)")) == 1)
    assert(st.evolvePartitionSpec(Seq("days(ts)")) == 0)
    assert(st.evolvePartitionSpec(Seq("months(ts)")) == 1)
    // the merge lands March under the NEW spec (one month tuple);
    // every old day file carries by reference, untouched
    st.mergeDelta(1L, 2L, march)
    // full read correct across mixed specs
    assert(st.read(2L).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      (seed.select("k", "v") unionByName march.select("k", "v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet)
    // old files carry spec 0 (absent/null id), new files stamp spec 1
    val man = st.manifest(2L)
    assert(man.columns.contains("spec_id"))
    assert(man.filter(coalesce(col("spec_id"), lit(0)) === 1).count() >= 1)
    assert(man.filter(coalesce(col("spec_id"), lit(0)) === 0).count() == 4L)
    // PRUNING BY EACH FILE'S OWN SPEC:
    // one old day → exactly that day's file opens
    val day2 = st.readSourceRange(2L, "ts",
      ts("2024-01-02 00:00:00"), ts("2024-01-02 23:59:59"))
    assert(day2.select("k").as[Long].collect().toSet == Set(3L, 4L))
    assert(files(day2).size == 1, files(day2))
    // the new month → only the new-spec file(s) open
    val mar = st.readSourceRange(2L, "ts",
      ts("2024-03-01 00:00:00"), ts("2024-03-31 23:59:59"))
    assert(mar.select("k").as[Long].collect().toSet == Set(100L, 101L))
    val allFiles = files(st.read(2L))
    assert(files(mar).subsetOf(allFiles) && files(mar).size < allFiles.size)
    assert((files(mar) intersect files(day2)).isEmpty)
    // January spans day files only (not Feb, not March)
    val jan = st.readSourceRange(2L, "ts",
      ts("2024-01-01 00:00:00"), ts("2024-01-31 23:59:59"))
    assert(jan.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(files(jan).size == 3, files(jan))
    // whole-partition verbs REFUSE on the mixed version — a month
    // predicate cannot select day files whole-file-exactly
    val eDrop = intercept[IllegalArgumentException](
      st.dropPartitions(2L, 90L, col("ts__month") === lit("2024-01-01")))
    assert(eDrop.getMessage.contains("earlier partition spec"), eDrop.getMessage)
    intercept[IllegalArgumentException](st.partitions(2L))
    intercept[IllegalArgumentException](st.replaceWhere(2L, 91L, march))
    // COMPACT unifies: everything re-lands under the CURRENT spec …
    st.compact(2L, 3L, minBytes = 1L << 30)
    val man3 = st.manifest(3L)
    assert(man3.filter(coalesce(col("spec_id"), lit(0)) =!= 1).count() == 0L)
    // … so the month-partition verbs work again, exactly
    val (_, droppedN, rowsDropped) =
      st.dropPartitions(3L, 4L, col("ts__month") === to_date(lit("2024-01-01")))
    assert(droppedN >= 1 && rowsDropped == 5L, s"$droppedN/$rowsDropped")
    assert(st.read(4L).select("k").as[Long].collect().toSet ==
      Set(6L, 7L, 100L, 101L))
  }

  test("snapshot: evolve days->months — same contract on the dir-per-version layout") {
    val base = java.nio.file.Files.createTempDirectory("graft_pe_sn").toString + "/t"
    val st = new SnapshotStore(spark, base, "k")
    st.writePartitioned(seed, 1L, Seq("days(ts)"))
    assert(st.evolvePartitionSpec(Seq("months(ts)")) == 1)
    st.mergeDelta(1L, 2L, march)
    assert(st.read(2L).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      (seed.select("k", "v") unionByName march.select("k", "v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet)
    val day2 = st.readSourceRange(2L, "ts",
      ts("2024-01-02 00:00:00"), ts("2024-01-02 23:59:59"))
    assert(day2.select("k").as[Long].collect().toSet == Set(3L, 4L))
    assert(files(day2).size == 1, files(day2))
    val mar = st.readSourceRange(2L, "ts",
      ts("2024-03-01 00:00:00"), ts("2024-03-31 23:59:59"))
    assert(mar.select("k").as[Long].collect().toSet == Set(100L, 101L))
    assert(files(mar).size < files(st.read(2L)).size)
    intercept[IllegalArgumentException](
      st.dropPartitions(2L, 90L, col("ts__month") === lit("2024-01-01")))
    intercept[IllegalArgumentException](st.partitions(2L))
    // fold the old era under the current spec via a partition-free
    // carry: this layout's compact is in-place per version, so unify
    // through a full merge-rewrite instead — rewrite every old key
    val rewrite = st.read(2L).filter(col("k") < 100L)
    st.mergeDelta(2L, 3L, rewrite.select("k", "ts", "v"))
    val zm3 = st.zoneMap(3L).get
    assert(zm3.filter(coalesce(col("spec_id"), lit(0)) =!= 1).count() == 0L)
    val (_, droppedN, rowsDropped) =
      st.dropPartitions(3L, 4L, col("ts__month") === to_date(lit("2024-01-01")))
    assert(droppedN >= 1 && rowsDropped == 5L, s"$droppedN/$rowsDropped")
    assert(st.read(4L).select("k").as[Long].collect().toSet ==
      Set(6L, 7L, 100L, 101L))
  }

  test("SQL: CALL set_partition_spec; evolved table serves correct rows with hidden derived cols and pruned source-range reads") {
    val root = java.nio.file.Files.createTempDirectory("graft_pe_sql").toString
    val st = new ManifestStore(spark, s"$root/pe", "k", statsCols = Seq("v"))
    st.writePartitioned(seed, 1L, Seq("days(ts)"))
    val cat = s"pecat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val r = spark.sql(s"CALL $cat.set_partition_spec('pe', 'months(ts)')")
      .collect().head
    assert(r.getLong(1) == 1L && r.getString(2) == "months(ts)", r.toString)
    st.mergeDelta(1L, 2L, march)
    // SELECT * hides BOTH eras' derived columns
    val all = spark.sql(s"SELECT * FROM $cat.pe")
    assert(all.columns.toSet == Set("k", "ts", "v"), all.columns.mkString(","))
    assert(all.count() == 9L)
    // a source-range predicate prunes per-file by each file's own spec
    val day2 = spark.sql(
      s"SELECT k FROM $cat.pe WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' " +
        "AND TIMESTAMP '2024-01-02 23:59:59'")
    assert(day2.as[Long].collect().toSet == Set(3L, 4L))
    val mar = spark.sql(
      s"SELECT k, v FROM $cat.pe WHERE ts >= TIMESTAMP '2024-03-01 00:00:00'")
    assert(mar.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((100L, 100.0), (101L, 101.0)))
  }
}
