package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.SnapshotStore

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("write/versions/read/diff/prune lifecycle") {
    val base = Files.createTempDirectory("graft_store").toString
    val store = new SnapshotStore(spark, base, "k")

    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val v2 = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    store.write(v1, 1L)
    store.write(v2, 2L)
    assert(store.versions() == Seq(1L, 2L))
    assert(store.read(1L).count() == 3)
    assert(store.latest().count() == 3)

    val changes = store.diff(1L, 2L)
      .select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes == Map(4L -> "insert", 3L -> "delete", 2L -> "update"))

    // restore v1 must byte-match the original content
    val restored = store.restore(1L).collect().map(_.toSeq).toSet
    assert(restored == v1.collect().map(_.toSeq).toSet)

    assert(store.prune(keepLast = 1) == Seq(1L))
    assert(store.versions() == Seq(2L))
  }

  test("schema evolution: added column doesn't storm diff; schemaDiff reports it") {
    val base = Files.createTempDirectory("graft_store_evo").toString
    val store = new SnapshotStore(spark, base, "k")
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    // v2: same data on common columns, one real update, one new column
    val v2 = Seq((1L, "a", 10.0, true), (2L, "CHANGED", 20.0, false))
      .toDF("k", "s", "v", "flag")
    store.write(v1, 1L)
    store.write(v2, 2L)

    val changes = store.diff(1L, 2L).select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes == Map(2L -> "update")) // row 1 unchanged on common cols

    val sd = store.schemaDiff(1L, 2L)
    assert(sd == Seq(SnapshotStore.SchemaChange("flag", "added", None, Some("BOOLEAN"))))
    assert(store.schemaDiff(2L, 1L)
      == Seq(SnapshotStore.SchemaChange("flag", "removed", Some("BOOLEAN"), None)))
  }

  test("compact merges small files atomically and preserves content") {
    val base = Files.createTempDirectory("graft_store_compact").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 500L).map(i => (i, s"row_$i", i * 1.5)).toDF("k", "s", "v")
    store.write(df.repartition(20), 7L)

    val before = store.read(7L).collect().map(_.toSeq).toSet
    val (filesBefore, filesAfter) = store.compact(7L) // default target ≫ data size
    assert(filesBefore == 20 && filesAfter == 1)
    assert(store.versions() == Seq(7L)) // rewrite carries its own _SUCCESS → still committed
    assert(store.read(7L).collect().map(_.toSeq).toSet == before)
    // idempotent: already compact → no-op
    assert(store.compact(7L) == (1, 1))
    // uncommitted dirs are rejected
    intercept[IllegalArgumentException](store.compact(99L))
  }

  test("range-partitioned write: keyed restore reads a strict subset of files") {
    val base = Files.createTempDirectory("graft_store_range").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 2000L).map(i => (i, s"row_$i", i * 1.5)).toDF("k", "s", "v")
    store.writeRangePartitioned(df, 1L, 10)

    // zone map exists, covers every file, ranges are disjoint-ish
    val zm = store.zoneMap(1L).get.collect()
    assert(zm.length >= 8) // ~10 range partitions → ~10 files
    assert(zm.map(_.getAs[Long]("n_rows")).sum == 2000L)

    // a narrow key range must NOT touch every file
    val pruned = store.prunedFiles(1L, 300L, 400L).get
    assert(pruned.nonEmpty && pruned.size < zm.length,
      s"expected a strict subset, got ${pruned.size} of ${zm.length}")

    // pruned read = full filtered read, exactly
    val viaZone = store.readKeyRange(1L, 300L, 400L).collect().map(_.toSeq).toSet
    val full = store.read(1L).filter(col("k").between(300L, 400L)).collect().map(_.toSeq).toSet
    assert(viaZone == full && viaZone.size == 101)

    // and the files the pruned plan scans really are the subset
    val scanned = store.readKeyRange(1L, 300L, 400L)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(scanned.subsetOf(pruned.toSet))

    // out-of-range restore is empty without scanning anything
    assert(store.readKeyRange(1L, 10000L, 20000L).isEmpty)

    // compact rebuilds the zone map; pruning still correct afterwards
    store.compact(1L)
    val afterCompact = store.readKeyRange(1L, 300L, 400L).collect().map(_.toSeq).toSet
    assert(afterCompact == full)
  }

  test("mergeDelta rewrites only touched files, carries zone map, merges exactly") {
    val base = Files.createTempDirectory("graft_store_cow").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 2000L).map(i => (i, s"row_$i", i * 1.5)).toDF("k", "s", "v")
    store.writeRangePartitioned(df, 1L, 10, statsCols = Seq("v"))
    val v1Names = store.zoneMap(1L).get.collect()
      .map(r => r.getAs[String]("file").split('/').last).toSet

    // delta confined to keys 100..120 (one or two files) + appends past
    // the envelope; deletes hit the same neighborhood
    val delta = ((100L to 120L).map(i => (i, s"upd_$i", i * 2.0)) ++
      (3001L to 3010L).map(i => (i, s"new_$i", i * 2.0))).toDF("k", "s", "v")
    val dels = Seq(125L, 130L).toDF("k")
    val (copied, rewrittenN) = store.mergeDelta(1L, 2L, delta, Some(dels))

    // most files byte-copied: same basenames live in v=2
    val v2Names = store.zoneMap(2L).get.collect()
      .map(r => r.getAs[String]("file").split('/').last).toSet
    assert(copied >= 8, s"expected >=8 untouched files, copied=$copied")
    assert(rewrittenN >= 1)
    assert((v1Names intersect v2Names).size == copied)

    // merged content is exactly base minus deletes/replaced plus delta
    val expected = df.join(delta.select("k").union(dels), Seq("k"), "left_anti")
      .unionByName(delta).collect().map(_.toSeq).toSet
    assert(store.read(2L).collect().map(_.toSeq).toSet == expected)

    // carried zone map still prunes correctly on key AND the stats col
    val viaZone = store.readKeyRange(2L, 300L, 400L).collect().map(_.toSeq).toSet
    val full = store.read(2L).filter(col("k").between(300L, 400L)).collect().map(_.toSeq).toSet
    assert(viaZone == full)
    val pruned = store.prunedFiles(2L, 300L, 400L).get
    assert(pruned.nonEmpty && pruned.size < v2Names.size)
    val viaStats = store.readWhere(2L, "v", 450.0, 600.0).collect().map(_.toSeq).toSet
    assert(viaStats == store.read(2L).filter(col("v").between(450.0, 600.0))
      .collect().map(_.toSeq).toSet)

    // empty delta: every file copies, nothing rewritten, content equal
    val (c3, _) = store.mergeDelta(2L, 3L, delta.limit(0), None)
    assert(c3 == store.zoneMap(2L).get.count())
    assert(store.read(3L).collect().map(_.toSeq).toSet ==
      store.read(2L).collect().map(_.toSeq).toSet)
  }

  test("deleteWhere: CoW predicate delete rewrites only matching files, keeps null-pred rows, prunes via hint") {
    val base = Files.createTempDirectory("graft_store_delw").toString
    val store = new SnapshotStore(spark, base, "k")
    // s is null every 500th row: a predicate over s evaluates NULL
    // there — those rows must be KEPT, not silently dropped
    val df = (1L to 2000L).map(i =>
        (i, if (i % 500 == 0) null else s"row_$i", i * 1.5))
      .toDF("k", "s", "v")
    store.writeRangePartitioned(df, 1L, 10, statsCols = Seq("v"))
    val v1Names = store.zoneMap(1L).get.collect()
      .map(r => r.getAs[String]("file").split('/').last).toSet

    // predicate matches keys 100..120 only (clustered → 1-2 files).
    // mode = cow: this test pins the COPY-ON-WRITE mechanics — a
    // sparse match like this one would otherwise auto-choose the
    // deletion-vector path (DeletionVectorSpec covers that).
    val (carried, rewrittenN, deleted) = store.deleteWhere(1L, 2L,
      col("k").between(100L, 120L) && col("s").startsWith("row_"), mode = "cow")
    assert(deleted == 21L, s"expected 21 deleted, got $deleted")
    assert(carried >= 8, s"expected >=8 carried files, got $carried")
    assert(rewrittenN >= 1)
    val v2Names = store.zoneMap(2L).get.collect()
      .map(r => r.getAs[String]("file").split('/').last).toSet
    assert((v1Names intersect v2Names).size == carried)
    // exact survivors, null-pred rows intact
    val expected = df.filter(!(col("k").between(100L, 120L) && col("s").startsWith("row_"))
        || col("s").isNull)
      .collect().map(_.toSeq).toSet
    assert(store.read(2L).collect().map(_.toSeq).toSet == expected)
    assert(store.read(2L).filter(col("s").isNull).count() == 4)
    // carried zone map still prunes on key and stats col
    val viaZone = store.readKeyRange(2L, 300L, 400L).collect().map(_.toSeq).toSet
    assert(viaZone == store.read(2L).filter(col("k").between(300L, 400L))
      .collect().map(_.toSeq).toSet)
    assert(store.readWhere(2L, "v", 450.0, 600.0).collect().map(_.toSeq).toSet ==
      store.read(2L).filter(col("v").between(450.0, 600.0)).collect().map(_.toSeq).toSet)

    // prune hint on the stats column: the match scan must read only
    // the zone-map-overlapping files, result identical
    val (c3, r3, d3) = store.deleteWhere(2L, 3L, col("v") > 2700.0,
      pruneHint = Some(("v", 2700.0, Double.MaxValue)))
    assert(d3 == store.read(2L).filter(col("v") > 2700.0).count())
    assert(c3 + r3 >= c3 && r3 >= 1)
    assert(store.read(3L).filter(col("v") > 2700.0).count() == 0)

    // no matches: pure carry (every physical file copies, none
    // rewritten — an empty rewrite may add an empty part), zero deleted
    val (c4, _, d4) = store.deleteWhere(3L, 4L, col("k") > 99999L)
    assert(d4 == 0L && c4 == store.dataFiles(3L).size)
    assert(store.read(4L).collect().map(_.toSeq).toSet ==
      store.read(3L).collect().map(_.toSeq).toSet)
  }

  test("deleteWhere on a schema-evolved store: sidecar carries, fills survive, predicate sees evolved columns") {
    val base = Files.createTempDirectory("graft_store_delw_evo").toString
    val store = new SnapshotStore(spark, base, "k")
    store.writeRangePartitioned(
      (1L to 400L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, 8)
    // evolve: add w with fill 0.0 (rides the _schema.json sidecar)
    store.mergeDelta(1L, 2L, Seq((5L, "upd_5", 9.5), (6L, "upd_6", 7.5))
      .toDF("k", "s", "w"), fill = Map("w" -> 0.0))
    // predicate over the EVOLVED column: carried files read w via the
    // sidecar fill, so w > 8 matches only k=5
    val (_, _, deleted) = store.deleteWhere(2L, 3L, col("w") > 8.0)
    assert(deleted == 1L)
    val v3 = store.read(3L)
    assert(v3.columns.toSeq == Seq("k", "s", "w"))
    val m = v3.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(!m.contains(5L) && m(6L) == ("upd_6", 7.5) && m.size == 399)
    // sidecar carried: fill still reads on byte-carried files
    assert(m(100L) == ("row_100", 0.0))
    // and the evolved read path still prunes through the carried map
    assert(store.readKeyRange(3L, 90L, 110L).columns.toSeq == Seq("k", "s", "w"))
  }

  test("legal hold: prune keeps a held version past keepLast until released") {
    val base = Files.createTempDirectory("graft_store_hold").toString
    val store = new SnapshotStore(spark, base, "k")
    (1L to 4L).foreach(v =>
      store.write((1L to 10L).map(i => (i, s"v${v}_$i")).toDF("k", "s"), v))
    store.hold(1L)
    assert(store.holds() == Seq(1L))
    assert(store.prune(keepLast = 2) == Seq(2L))
    assert(store.versions() == Seq(1L, 3L, 4L))
    assert(store.read(1L).count() == 10)
    store.release(1L)
    assert(store.prune(keepLast = 2) == Seq(1L))
    assert(store.versions() == Seq(3L, 4L))
    intercept[IllegalArgumentException](store.hold(99L))
  }

  test("restoreAndValidate reports ok on a clean copy and flags tampering") {
    import graft.functions.Fx
    val base = Files.createTempDirectory("graft_store_restore").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 200L).map(i => (i, s"p${i % 3}", s"row_$i")).toDF("k", "part", "s")
    store.write(df, 1L)

    val target = Files.createTempDirectory("graft_restore_target").toString + "/copy"
    val fp = (d: org.apache.spark.sql.DataFrame) => Fx.fingerprint(d("k"), d("s"))
    val report = store.restoreAndValidate(1L, target, Seq("part"), fp)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(report.size == 3 && report.values.forall(_ == "ok"))

    // tamper with the restored copy: drop one partition's files' rows
    val damaged = spark.read.parquet(target).filter(!(col("part") === "p2"))
    damaged.write.mode("overwrite").parquet(target + "_damaged")
    val report2 = graft.operators.Snapshot.validateCopy(
      store.read(1L), spark.read.parquet(target + "_damaged"), Seq("part"), col("k"), fp)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(report2("p2") == "missing_in_target")
    assert(report2("p0") == "ok" && report2("p1") == "ok")
  }

  test("secondary-column zone stats prune restores filtered on a non-key column") {
    val base = Files.createTempDirectory("graft_store_stats").toString
    val store = new SnapshotStore(spark, base, "k")
    // ts correlates with k (the common lake case: monotonically
    // assigned ids vs event time) — so key-ranged files have tight ts
    // ranges too and a ts-filtered restore can skip files
    val df = (1L to 2000L).map(i => (i, 1000000L + i * 60L, s"row_$i")).toDF("k", "ts", "s")
    store.writeRangePartitioned(df, 1L, 10, statsCols = Seq("ts"))

    val zm = store.zoneMap(1L).get
    assert(zm.columns.contains("min_ts") && zm.columns.contains("max_ts"))

    val tsLo = 1000000L + 500L * 60L
    val tsHi = 1000000L + 600L * 60L
    val pruned = store.prunedFilesBy(1L, "ts", tsLo, tsHi).get
    assert(pruned.nonEmpty && pruned.size < zm.count(),
      s"expected strict subset, got ${pruned.size} of ${zm.count()}")
    val viaStats = store.readWhere(1L, "ts", tsLo, tsHi).collect().map(_.toSeq).toSet
    val full = store.read(1L).filter(col("ts").between(tsLo, tsHi)).collect().map(_.toSeq).toSet
    assert(viaStats == full && viaStats.size == 101)

    // a column without stats falls back to a correct full-scan filter
    assert(store.prunedFilesBy(1L, "s", "row_1", "row_2").isEmpty)
    assert(store.readWhere(1L, "s", "row_10", "row_11").collect().map(_.toSeq).toSet ==
      store.read(1L).filter(col("s").between("row_10", "row_11")).collect().map(_.toSeq).toSet)

    // compact preserves the stat columns in the rebuilt zone map
    store.compact(1L)
    assert(store.zoneMap(1L).get.columns.contains("min_ts"))
    assert(store.readWhere(1L, "ts", tsLo, tsHi).collect().map(_.toSeq).toSet == full)
  }

  test("readForKeys stacks zone-map + Bloom + exact semi-join correctly") {
    val base = Files.createTempDirectory("graft_store_keys").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 2000L).map(i => (i, s"row_$i", i * 1.5)).toDF("k", "s", "v")
    store.writeRangePartitioned(df, 1L, 10)

    // clustered delta: the zone map alone should skip most files
    val delta = Seq(310L, 355L, 398L).toDF("key")
    val got = store.readForKeys(1L, delta).collect().map(_.toSeq).toSet
    val want = store.read(1L).filter(col("k").isin(310L, 355L, 398L))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.size == 3)

    // spread delta still exact (bounds cover everything → Bloom does the work)
    val spread = Seq(5L, 1995L).toDF("key")
    assert(store.readForKeys(1L, spread).collect().map(_.toSeq).toSet ==
      store.read(1L).filter(col("k").isin(5L, 1995L)).collect().map(_.toSeq).toSet)

    // empty delta: empty result, no scan
    assert(store.readForKeys(1L, spark.emptyDataFrame.select(lit(null).cast("long").as("key"))
      .limit(0)).isEmpty)
  }

  test("diffKeyRange equals full diff restricted to the range") {
    val base = Files.createTempDirectory("graft_store_rdiff").toString
    val store = new SnapshotStore(spark, base, "k")
    val v1 = (1L to 1000L).map(i => (i, s"row_$i", i * 1.0)).toDF("k", "s", "v")
    // v2: updates in [100,200], a delete at 150, inserts at 1001..1010
    val v2 = (1L to 1000L).filterNot(_ == 150L).map { i =>
      (i, if (i >= 100 && i <= 200) s"upd_$i" else s"row_$i", i * 1.0)
    }.++((1001L to 1010L).map(i => (i, s"new_$i", i * 1.0))).toDF("k", "s", "v")
    store.writeRangePartitioned(v1, 1L, 8)
    store.writeRangePartitioned(v2, 2L, 8)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "change_type").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ranged = canon(store.diffKeyRange(1L, 2L, 120L, 180L))
    val full = canon(store.diff(1L, 2L).filter(col("k").between(120L, 180L)))
    assert(ranged == full)
    assert(ranged.contains((150L, "delete")) && ranged.contains((120L, "update")))
  }

  test("lake snapshot: group-atomic commit, consistent restore, RI validation") {
    import graft.operators.LakeSnapshot
    val base = Files.createTempDirectory("graft_lake").toString
    val lake = new LakeSnapshot(spark, base)
    val parent = Seq((10L, "x"), (20L, "y")).toDF("pk", "p")
    val child = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("ck", "fk")
    lake.write(Map("parent" -> parent, "child" -> child), 1L)
    assert(lake.versions() == Seq(1L))
    assert(lake.tablesOf(1L).toSet == Set("parent", "child"))

    // a crashed half-write of v2 (one table, no marker) stays invisible
    child.limit(1).write.parquet(s"$base/child/v=2")
    assert(lake.versions() == Seq(1L))
    intercept[IllegalArgumentException](lake.read("child", 2L))

    // full-group restore is consistent; RI validation is clean
    val restored = lake.restoreAll(1L)
    assert(restored("child").count() == 3 && restored("parent").count() == 2)
    val report = lake.validate(1L,
      Seq(("child.fk->parent", "child", "fk", "parent", "pk"))).collect().head
    assert(report.getAs[Long]("n_orphans") == 0L)

    // a broken group (orphaned fk) is caught post-restore
    lake.write(Map("parent" -> parent.limit(1), "child" -> child), 3L)
    val bad = lake.validate(3L,
      Seq(("child.fk->parent", "child", "fk", "parent", "pk"))).collect().head
    assert(bad.getAs[Long]("n_orphans") > 0L)
  }

  test("readAsOf resolves a timestamp to the newest version at or before it") {
    val base = Files.createTempDirectory("graft_asof").toString
    val store = new SnapshotStore(spark, base, "k")
    val v1 = (1L to 100L).map(i => (i, "a")).toDF("k", "s")
    store.writeRangePartitioned(v1, 1L, 4, commitTs = Some(1000L))
    store.mergeDelta(1L, 2L, Seq((1L, "b")).toDF("k", "s"), None, commitTs = Some(2000L))
    store.mergeDelta(2L, 3L, spark.emptyDataset[(Long, String)].toDF("k", "s"),
      Some(Seq(Tuple1(2L)).toDF("k")), commitTs = Some(3000L))

    // exactly at a commit → that version; between commits → the older;
    // after the last → the last
    assert(store.versionAsOf(2000L).contains(2L))
    assert(store.versionAsOf(2999L).contains(2L))
    assert(store.versionAsOf(3000L).contains(3L))
    assert(store.versionAsOf(999999L).contains(3L))
    val asOf = store.readAsOf(2500L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asOf(1L) == "b" && asOf.contains(2L) && asOf.size == 100)
    val latest = store.readAsOf(999999L).collect().map(_.getLong(0)).toSet
    assert(!latest.contains(2L) && latest.size == 99)

    // before the first commit: no version — explicit failure, not v1
    assert(store.versionAsOf(999L).isEmpty)
    val ex = intercept[IllegalArgumentException](store.readAsOf(500L))
    assert(ex.getMessage.contains("earliest"))

    // compaction rewrites layout, not identity: commit ts carries over
    store.compact(1L, targetBytes = 1L << 40)
    assert(store.commitTimestamp(1L) == 1000L)
    assert(store.readAsOf(1500L).count() == 100L)

    // composed restore path: validate the copy of the as-of version
    val target = Files.createTempDirectory("graft_asof_restore").toString + "/copy"
    val report = store.restoreAndValidateAsOf(2500L, target, Seq("s"),
      df => md5(concat_ws("|", df("k").cast("string"), df("s"))))
    assert(report.collect().forall(_.getAs[String]("status") == "ok"))
  }

  test("lake snapshot: crash-leftover and stray marker files never surface as versions") {
    import graft.operators.LakeSnapshot
    import java.nio.file.{Files => JFiles, Paths}
    val base = Files.createTempDirectory("graft_lake_marker").toString
    val lake = new LakeSnapshot(spark, base)
    val t = Seq((1L, "a"), (2L, "b")).toDF("pk", "s")
    lake.write(Map("t" -> t), 1L)
    assert(lake.versions() == Seq(1L))

    // a crash mid-commit can only ever leave the dot-prefixed tmp (the
    // marker itself lands by atomic rename) — plant one, truncated
    JFiles.write(Paths.get(base, "_commits", ".tmp-2-crashed"), Array[Byte](0, 3, 'a'))
    // plus a stray non-numeric file an external tool dropped in
    JFiles.write(Paths.get(base, "_commits", "notes.txt"), "hi".getBytes)
    // neither surfaces as a version, crashes the listing, or poisons restore
    assert(lake.versions() == Seq(1L))
    assert(lake.restoreAll(1L)("t").count() == 2L)
    intercept[IllegalArgumentException](lake.read("t", 2L))

    // ',' is the marker separator — a name containing it is rejected
    // up front instead of corrupting the encoding
    intercept[IllegalArgumentException](lake.write(Map("a,b" -> t), 5L))
  }

  test("convergent chunk encryption: round trip, dedup-preserving, key-scoped") {
    import graft.operators.ChunkCrypto
    val master = Array.tabulate[Byte](32)(_.toByte)
    val chunk = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val (ref, blob) = ChunkCrypto.encryptChunk(master, chunk)
    // round trip + authenticated
    assert(ChunkCrypto.decryptChunk(master, ref, blob).toSeq == chunk.toSeq)
    // convergent: identical plaintext → identical ciphertext (dedup works)
    val (ref2, blob2) = ChunkCrypto.encryptChunk(master, chunk.clone())
    assert(ref2.toSeq == ref.toSeq && blob2.toSeq == blob.toSeq)
    // a different master produces different ciphertext and fails auth
    val other = Array.tabulate[Byte](32)(i => (i + 1).toByte)
    assert(ChunkCrypto.encryptChunk(other, chunk)._2.toSeq != blob.toSeq)
    intercept[javax.crypto.AEADBadTagException](
      ChunkCrypto.decryptChunk(other, ref, blob))
    // tampering is detected
    val bad = blob.clone(); bad(3) = (bad(3) ^ 1).toByte
    intercept[javax.crypto.AEADBadTagException](
      ChunkCrypto.decryptChunk(master, ref, bad))

    // end-to-end over a payload frame: dedup ratio on ciphertext refs
    // equals the plaintext chunk dedup (duplicated payload shares all)
    val df = Seq((1L, "alpha beta gamma delta".getBytes("UTF-8")),
      (2L, "alpha beta gamma delta".getBytes("UTF-8"))).toDF("id", "payload")
    val encDf = ChunkCrypto.encryptedChunks(df, "id", "payload", master)
    val enc = encDf.collect()
    val byId = enc.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getString(2)).toSeq == byId(2L).map(_.getString(2)).toSeq)

    // the full loop: restore from the encrypted chunk frame is
    // byte-identical to the original payloads
    val restored = ChunkCrypto.reassemble(encDf, "id", master).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(restored(1L) == "alpha beta gamma delta".getBytes("UTF-8").toSeq)
    assert(restored(2L) == restored(1L))
  }

  test("stats reports files/rows/bytes from metadata only") {
    val base = Files.createTempDirectory("graft_store_stats2").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = (1L to 500L).map(i => (i, s"r$i")).toDF("k", "s")
    store.writeRangePartitioned(df, 1L, 4)
    val (files, rows, bytes) = store.stats(1L)
    assert(files >= 3 && rows == 500L && bytes > 0L)
    // no zone map → rows honestly unknown
    store.write(df, 2L)
    val (f2, r2, b2) = store.stats(2L)
    assert(f2 >= 1 && r2 == -1L && b2 > 0L)
  }

  test("vacuum removes expired crash leftovers, never committed versions") {
    val base = Files.createTempDirectory("graft_store_vac").toString
    val store = new SnapshotStore(spark, base, "k")
    store.write(Seq((1L, "a")).toDF("k", "s"), 1L)
    // model a crashed write and a crashed compact move-aside
    new java.io.File(s"$base/.tmp-v=9-dead").mkdirs()
    new java.io.File(s"$base/.old-v=1-dead").mkdirs()
    // fresh leftovers survive a TTL'd vacuum (an in-flight writer)
    assert(store.vacuum(ttlMs = 60000L).isEmpty)
    val gone = store.vacuum(ttlMs = 0L)
    assert(gone.size == 2 && gone.forall(p => p.contains(".tmp-") || p.contains(".old-")))
    assert(store.versions() == Seq(1L))
    assert(store.read(1L).count() == 1L)
  }

  test("uncommitted versions are invisible; empty store fails clearly") {
    val base = Files.createTempDirectory("graft_store2").toString
    val store = new SnapshotStore(spark, base, "k")

    assert(store.versions().isEmpty)
    assert(store.latestVersion().isEmpty)
    val ex = intercept[IllegalStateException](store.latest())
    assert(ex.getMessage.contains("no committed versions"))

    // a partial write (v=N dir without _SUCCESS, e.g. from a crashed
    // job) must not surface as a readable version
    val partial = new java.io.File(s"$base/v=7")
    partial.mkdirs()
    Files.writeString(partial.toPath.resolve("part-00000.parquet"), "garbage")
    assert(store.versions().isEmpty)

    store.write(Seq((1L, "a")).toDF("k", "s"), 8L)
    assert(store.versions() == Seq(8L))
    assert(store.latest().count() == 1)
    // the atomic publish leaves no temp dirs behind
    val leftovers = Option(new java.io.File(base).listFiles()).get
      .map(_.getName).filter(_.startsWith(".tmp-"))
    assert(leftovers.isEmpty)
  }

  test("z-ordered layout prunes files on EVERY clustered dimension") {
    // uniform 100×100 grid: under a z-order both x and y are locally
    // narrow per file; under a range layout on x, y spans everything
    val base = Files.createTempDirectory("graft_zstore").toString
    val rows = for (x <- 0 until 100; y <- 0 until 100)
      yield (x.toLong * 100 + y, x.toLong, y.toLong)
    val df = rows.toDF("k", "x", "y").repartition(8)

    val zStore = new SnapshotStore(spark, s"$base/z", "k")
    zStore.writeZOrdered(df, 1L, 16, Seq("x", "y"))
    val rStore = new SnapshotStore(spark, s"$base/r", "k")
    rStore.writeRangePartitioned(df.repartitionByRange(16, col("x")), 1L, 16, Seq("x", "y"))

    val total = zStore.zoneMap(1L).get.count()
    assert(total >= 8, s"want a multi-file layout, got $total files")
    val xSurv = zStore.prunedFilesBy(1L, "x", 10L, 20L).get.size
    val ySurv = zStore.prunedFilesBy(1L, "y", 10L, 20L).get.size
    assert(xSurv < total, s"x-range should prune: $xSurv of $total")
    assert(ySurv < total, s"y-range should prune: $ySurv of $total")
    // the range-by-x layout cannot prune on y (every file spans all y)
    val yRangeSurv = rStore.prunedFilesBy(1L, "y", 10L, 20L).get.size
    assert(yRangeSurv == rStore.zoneMap(1L).get.count())

    // conjunctive restore: intersection of survivor sets, exact result
    val got = zStore.readWhereAll(1L, Seq(("x", 10L, 20L), ("y", 10L, 20L)))
      .select("k").collect().map(_.getLong(0)).sorted
    val want = rows.filter(r => r._2 >= 10 && r._2 <= 20 && r._3 >= 10 && r._3 <= 20)
      .map(_._1).sorted
    assert(got.toSeq == want)
  }

  test("compact preserves z-order clustering and multi-dim pruning") {
    val base = Files.createTempDirectory("graft_zcompact").toString
    val rows = for (x <- 0 until 60; y <- 0 until 60)
      yield (x.toLong * 60 + y, x.toLong, y.toLong)
    val store = new SnapshotStore(spark, base, "k")
    store.writeZOrdered(rows.toDF("k", "x", "y").repartition(8), 1L, 32, Seq("x", "y"))
    val (before, after) = store.compact(1L, targetBytes = 64L << 10)
    assert(after < before, s"compaction should reduce files: $before -> $after")
    // the narrow coalesce concatenates ADJACENT z-sorted files, so both
    // dimensions keep pruning through the rebuilt zone map
    val total = store.zoneMap(1L).get.count()
    if (total > 2) {
      assert(store.prunedFilesBy(1L, "x", 5L, 10L).get.size < total)
      assert(store.prunedFilesBy(1L, "y", 5L, 10L).get.size < total)
    }
    // and the data survives exactly
    val got = store.readWhereAll(1L, Seq(("x", 5L, 10L), ("y", 5L, 10L))).count()
    assert(got == 36L)
  }

  test("readWhereAll falls back to a correct full scan without stats") {
    val base = Files.createTempDirectory("graft_zstore2").toString
    val store = new SnapshotStore(spark, base, "k")
    store.write(Seq((1L, 5L), (2L, 15L), (3L, 25L)).toDF("k", "v"), 1L)
    val got = store.readWhereAll(1L, Seq(("v", 10L, 30L)))
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("z-order on a constant or null column degrades safely, never wrongly") {
    val base = Files.createTempDirectory("graft_zstore3").toString
    val store = new SnapshotStore(spark, base, "k")
    val df = Seq((1L, 7L, Some(1L)), (2L, 7L, None), (3L, 7L, Some(3L)))
      .toDF("k", "c", "n")
    store.writeZOrdered(df, 1L, 2, Seq("c", "n"))
    // constant column: everything buckets to 0 — still readable & exact
    val got = store.readWhereAll(1L, Seq(("c", 7L, 7L))).count()
    assert(got == 3L)
    // null rows must never be pruned away by a range on the null column
    val gotN = store.readWhereAll(1L, Seq(("n", 1L, 3L))).count()
    assert(gotN == 2L)
  }

  test("chunkAccounting: per-version new/shared/exclusive bytes over hand-built refs") {
    import graft.operators.ChunkCrypto
    import org.apache.spark.sql.functions.col
    // v1: a (10 B, ×2 occurrences), b (20 B)
    // v2: a, c (30 B)      — adds c, shares a, drops b
    // v3: c                — pure subset of v2
    val v1 = Seq(("a", 10L), ("a", 10L), ("b", 20L)).toDF("ref", "bytes")
    val v2 = Seq(("a", 10L), ("c", 30L)).toDF("ref", "bytes")
    val v3 = Seq(("c", 30L)).toDF("ref", "bytes")
    val out = ChunkCrypto.chunkAccounting(
      Seq(1L -> v1, 2L -> v2, 3L -> v3), "ref", col("bytes"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap
    //                 n_chunks logical n_refs physical new_refs new_bytes exclusive
    assert(out(1L) == Seq(3L, 40L, 2L, 30L, 2L, 30L, 20L)) // b exclusive to v1
    assert(out(2L) == Seq(2L, 40L, 2L, 40L, 1L, 30L, 0L))  // c new; a,c shared
    assert(out(3L) == Seq(1L, 30L, 1L, 30L, 0L, 0L, 0L))   // nothing new, nothing exclusive
  }

  test("chunkAccounting invariants hold on randomized version chains") {
    import graft.operators.ChunkCrypto
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    // 4 versions drawn from a 40-ref universe with random sizes
    val universe = (0 until 40).map(i => (s"r$i", (rnd.nextInt(100) + 1).toLong))
    val versions = (1L to 4L).map { v =>
      val refs = universe.filter(_ => rnd.nextDouble() < 0.5)
      val occs = refs.flatMap(r => Seq.fill(rnd.nextInt(3) + 1)(r))
      v -> occs.toDF("ref", "bytes")
    }
    val out = ChunkCrypto.chunkAccounting(versions, "ref", col("bytes"))
      .collect().map(r => r.getLong(0) -> r).toMap
    versions.foreach { case (v, _) =>
      val r = out(v)
      val (chunks, logical) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("logical_bytes"))
      val (refs, physical) = (r.getAs[Long]("n_refs"), r.getAs[Long]("physical_bytes"))
      assert(refs <= chunks && physical <= logical)
      assert(r.getAs[Long]("n_new_refs") <= refs)
      assert(r.getAs[Long]("new_bytes") <= physical)
      assert(r.getAs[Long]("exclusive_bytes") <= physical)
    }
    // identity: every address is "new" exactly once, so the new_bytes
    // column sums to the store's total distinct footprint
    val totalNew = out.values.map(_.getAs[Long]("new_bytes")).sum
    val distinctBytes = versions.map(_._2).reduce(_.unionByName(_))
      .groupBy("ref").agg(org.apache.spark.sql.functions.max("bytes").as("b"))
      .agg(org.apache.spark.sql.functions.sum("b")).head().getLong(0)
    assert(totalNew == distinctBytes)
  }

  test("restorePlan counts fetch vs reuse per DISTINCT address") {
    import graft.operators.ChunkCrypto
    import org.apache.spark.sql.functions.col
    val have = Seq(("a", 10L), ("b", 20L)).toDF("ref", "bytes")
    // want references a three times (fetched/held once) and new chunk c
    val want = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("c", 30L)).toDF("ref", "bytes")
    val r = ChunkCrypto.restorePlan(have, want, "ref", col("bytes")).collect().head
    assert(r.getAs[Long]("n_refs") == 2L)
    assert(r.getAs[Long]("restore_bytes") == 40L)
    assert(r.getAs[Long]("n_fetch") == 1L && r.getAs[Long]("fetch_bytes") == 30L)
    assert(r.getAs[Long]("n_reused") == 1L && r.getAs[Long]("reused_bytes") == 10L)
    assert(r.getAs[Double]("reuse_ratio") == 0.25)
  }

  test("mergeDelta schema evolution: column-add rides a sidecar, carried files read fill/null, type change fails fast") {
    val base = Files.createTempDirectory("graft_store_evo").toString
    val store = new SnapshotStore(spark, base, "k")
    store.writeRangePartitioned(
      (1L to 400L).map(i => (i, s"row_$i")).toDF("k", "s"), 1L, 8)

    // delta ADDS column w; only file 1 (keys 1..50) is touched
    val delta = Seq((5L, "upd_5", 9.5), (401L, "new_401", 1.5)).toDF("k", "s", "w")
    val (copied, rewritten) = store.mergeDelta(1L, 2L, delta,
      Some(Seq(Tuple1(7L)).toDF("k")), fill = Map("w" -> 0.0))
    assert(copied > 0 && rewritten > 0)

    val v2 = store.read(2L)
    assert(v2.columns.toSeq == Seq("k", "s", "w"))
    val m = v2.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(m(5L) == ("upd_5", 9.5) && m(401L) == ("new_401", 1.5))
    assert(!m.contains(7L) && m.size == 400)
    // fill default reads uniformly: survivor rows in the REWRITTEN
    // file (k=10) and rows in byte-CARRIED files (k=100) both get it
    assert(m(10L) == ("row_10", 0.0) && m(100L) == ("row_100", 0.0))
    // CoW held: untouched basenames shared with v1 despite evolution
    val names = (v: Long) => store.dataFiles(v).map(_.getName).toSet
    assert((names(1L) intersect names(2L)).size >= 5)
    // the zone-map-pruned read path serves the evolved schema too
    val ranged = store.readKeyRange(2L, 90L, 110L)
    assert(ranged.columns.toSeq == Seq("k", "s", "w"))
    assert(ranged.collect().forall(_.getDouble(2) == 0.0))

    // a LATER delta that DROPS s: survivor rows keep s, delta row
    // reads s null; w carries its real value
    store.mergeDelta(2L, 3L, Seq((10L, 3.25)).toDF("k", "w"))
    val v3 = store.read(3L).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getDouble(2)))).toMap
    assert(v3(10L) == (None, 3.25))
    assert(v3(5L) == (Some("upd_5"), 9.5) && v3(100L) == (Some("row_100"), 0.0))
    // diff across the evolution stays row-accurate (common-column
    // fingerprints): only the touched key changed
    val d23 = store.diff(2L, 3L).select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d23 == Map(10L -> "update"))

    // changing an existing column's TYPE is refused
    val bad = Seq((1L, 42L)).toDF("k", "s") // s was STRING
    val e = intercept[IllegalArgumentException] { store.mergeDelta(3L, 4L, bad) }
    assert(e.getMessage.contains("type changed"))
    // fill for a column the delta does not introduce is refused
    val e2 = intercept[IllegalArgumentException] {
      store.mergeDelta(3L, 4L, Seq((1L, "x", 0.5)).toDF("k", "s", "w"),
        fill = Map("s" -> "?"))
    }
    assert(e2.getMessage.contains("fill keys"))
  }
}
