package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{ManifestStore, SnapshotStore}

/** Merge-on-read deletes (deletion vectors) on both store layouts —
  * Delta/Iceberg's DV design at parquet row-index granularity: a point
  * delete publishes a metadata-sized (file, position) mask instead of
  * rewriting gigabyte files; reads anti-join the broadcast mask;
  * compaction folds it in. The headline invariant: a sparse delete
  * touches O(|matching rows|) bytes — proven here by the pool file set
  * being BIT-IDENTICAL across the delete. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: String) = new Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(ks: Range) = ks.map(k => (k.toLong, s"v-$k", k * 10.0))
    .toDF("k", "v", "x")

  private def contents(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def poolListing(base: String): Set[(String, Long)] = {
    val fs = fsOf(base)
    fs.listStatus(new Path(s"$base/files"))
      .map(st => (st.getPath.getName, st.getLen)).toSet
  }

  test("linked: a sparse MERGE-ON-READ UPDATE rewrites NO existing file; == CoW; foldDv clears") {
    val root = java.nio.file.Files.createTempDirectory("graft-updv-lk").toString
    val st = new graft.operators.ManifestStore(spark, s"$root/u", "k")
    st.write(rows(1 to 1000), 1L, numFiles = 4)
    val before = poolListing(s"$root/u")
    def files(v: Long) = st.manifest(v).select("file").collect().map(_.getString(0)).toSet
    // 3 matched rows in 1000: auto picks merge-on-read
    val (shared, fresh, updated) = st.updateWhere(1L, 2L,
      col("k").isin(7L, 411L, 902L), Map("v" -> concat(col("v"), lit("!"))))
    assert(shared == 4 && fresh >= 1 && updated == 3L)
    // every v1 file carries BY REFERENCE; the pool only GREW (no rewrite)
    assert(files(1L).subsetOf(files(2L)), "old files must carry by reference")
    assert(before.subsetOf(poolListing(s"$root/u")), "no existing pool byte may change")
    val want = contents(st.read(1L)).map {
      case (k, v) if Set(7L, 411L, 902L)(k) => (k, v + "!")
      case r => r
    }
    assert(contents(st.read(2L)) == want)
    // identical to what copy-on-write computes
    st.updateWhere(1L, 3L, col("k").isin(7L, 411L, 902L),
      Map("v" -> concat(col("v"), lit("!"))), mode = "cow"): Unit
    assert(contents(st.read(3L)) == want, "MoR and CoW must agree")
    // history pinned; foldDv folds the mask in for good
    assert(contents(st.read(1L)).size == 1000)
    st.foldDv(2L, 4L): Unit
    assert(st.dvFrame(4L).isEmpty && contents(st.read(4L)) == want)
    // a dense update still picks copy-on-write under auto
    val (_, _, dense) = st.updateWhere(4L, 5L, col("k") % 2 === 0,
      Map("v" -> lit("even")))
    assert(dense == 500L && st.dvFrame(5L).isEmpty,
      "a 50% update must rewrite, not mask")
  }

  test("snapshot: merge-on-read UPDATE — no parquet decode of existing files; == CoW") {
    val root = java.nio.file.Files.createTempDirectory("graft-updv-sn").toString
    val st = new graft.operators.SnapshotStore(spark, s"$root/u", "k")
    st.writeRangePartitioned(rows(1 to 1000), 1L, 4)
    val (shared, fresh, updated) = st.updateWhere(1L, 2L,
      col("k").isin(5L, 600L), Map("x" -> (col("x") + 0.5)))
    assert(shared == 4 && fresh >= 1 && updated == 2L)
    assert(st.dvFrame(2L).map(_.count()) == Some(2L))
    def vals(v: Long) = st.read(v).select("k", "x").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val want = vals(1L).map { case (k, x) =>
      if (Set(5L, 600L)(k)) (k, x + 0.5) else (k, x) }
    assert(vals(2L) == want)
    st.updateWhere(1L, 3L, col("k").isin(5L, 600L),
      Map("x" -> (col("x") + 0.5)), mode = "cow"): Unit
    assert(vals(3L) == want, "MoR and CoW must agree")
    // zone-map prune still exact after the MoR update (new files mapped)
    assert(st.readKeyRange(2L, 600L, 600L).select("x").head().getDouble(0) ==
      want(600L))
  }

  test("both layouts: MERGE-ON-READ MERGE == copy-on-write mergeDelta; zero existing-file rewrite") {
    // upserts (2 replaced + 1 new) + 1 delete, against 1000 rows
    val delta = Seq((7L, "v7!", 7.5), (411L, "v411!", 1.0), (2001L, "new", 2.0))
      .toDF("k", "v", "x")
    val dels = Seq(902L).toDF("k")
    // linked: the pool only GROWS, every v1 manifest entry carries
    val root = java.nio.file.Files.createTempDirectory("graft-mor-lk").toString
    val lk = new graft.operators.ManifestStore(spark, s"$root/m", "k")
    lk.write(rows(1 to 1000), 1L, numFiles = 4)
    val before = poolListing(s"$root/m")
    val (fresh, masked) = lk.mergeDeltaMor(1L, 2L, delta, Some(dels))
    assert(fresh >= 1 && masked == 3L, s"($fresh, $masked)")
    assert(before.subsetOf(poolListing(s"$root/m")), "no existing pool byte may change")
    def fileSet(v: Long) = lk.manifest(v).select("file").collect().map(_.getString(0)).toSet
    assert(fileSet(1L).subsetOf(fileSet(2L)))
    // CoW twin computes the identical table
    lk.mergeDelta(1L, 3L, delta, Some(dels)): Unit
    assert(contents(lk.read(2L)) == contents(lk.read(3L)), "MoR and CoW merges must agree")
    assert(!contents(lk.read(2L)).exists(_._1 == 902L))
    assert(contents(lk.read(2L)).exists(r => r._1 == 7L && r._2 == "v7!"))
    // compaction folds the mask in for good
    lk.foldDv(2L, 4L): Unit
    assert(lk.dvFrame(4L).isEmpty && contents(lk.read(4L)) == contents(lk.read(2L)))
    // snapshot twin: byte-copies + mask + new files, same table
    val sn = new graft.operators.SnapshotStore(spark, s"$root/s", "k")
    sn.writeRangePartitioned(rows(1 to 1000), 1L, 4)
    val (fr2, m2) = sn.mergeDeltaMor(1L, 2L, delta, Some(dels))
    assert(fr2 >= 1 && m2 == 3L)
    sn.mergeDelta(1L, 3L, delta, Some(dels)): Unit
    assert(contents(sn.read(2L)) == contents(sn.read(3L)))
    // an evolving delta refuses onto the CoW path
    val e = intercept[IllegalArgumentException] {
      lk.mergeDeltaMor(4L, 5L, delta.withColumn("extra", lit(1)))
    }
    assert(e.getMessage.contains("same-schema"))
  }

  test("linked: a sparse delete publishes a DV — pool bytes UNTOUCHED, result == CoW result") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-lk").toString
    val st = new ManifestStore(spark, s"$root/dv", "k")
    st.write(rows(1 to 1000), 1L, numFiles = 4)
    val before = poolListing(s"$root/dv")
    // 3 matching rows in a 1000-row table: auto picks merge-on-read
    val (sharedN, rewrittenN, deleted) =
      st.deleteWhere(1L, 2L, col("k").isin(7L, 411L, 902L))
    assert((sharedN, rewrittenN, deleted) == ((4, 0, 3L)))
    // the O(|matching rows|) claim: not one pool byte moved or landed
    assert(poolListing(s"$root/dv") == before,
      "a DV delete must write ZERO data files")
    val want = contents(st.read(1L)).filterNot(r => Set(7L, 411L, 902L)(r._1))
    assert(contents(st.read(2L)) == want)
    // identical to what copy-on-write computes
    st.deleteWhere(2L, 3L, col("k").isin(7L, 411L, 902L), mode = "cow"): Unit
    assert(contents(st.read(3L)) == want, "DV and CoW must agree")
    // v1 history unaffected
    assert(contents(st.read(1L)).size == 1000)
  }

  test("linked: auto policy — dense deletes still choose copy-on-write") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-dense").toString
    val st = new ManifestStore(spark, s"$root/d", "k")
    st.write(rows(1 to 300), 1L, numFiles = 2)
    val (_, rewritten, deleted) = st.deleteWhere(1L, 2L, col("k") % 2 === 0)
    assert(deleted == 150L && rewritten > 0, "a 50% delete must rewrite, not mask")
    val fs = fsOf(s"$root/d")
    assert(!fs.exists(new Path(s"$root/d/_manifests/v=2/_dv")))
  }

  test("linked: merges on top of a DV — no resurrection, rewritten files shed entries, carried files keep them") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-merge").toString
    val st = new ManifestStore(spark, s"$root/m", "k")
    st.write(rows(1 to 400), 1L, numFiles = 4) // ranges ~[1,100][101,200]...
    st.deleteWhere(1L, 2L, col("k").isin(5L, 350L)): Unit // DV on first+last file
    // upsert key 7 → rewrites the FIRST file; key 5 must stay deleted
    // (its mask entry is folded into the rewrite), key 350's entry carries
    st.mergeDelta(2L, 3L, Seq((7L, "v7-new", 70.0)).toDF("k", "v", "x")): Unit
    val got = contents(st.read(3L))
    assert(!got.exists(_._1 == 5L), "DV-deleted row resurrected through mergeDelta")
    assert(!got.exists(_._1 == 350L))
    assert(got.exists(r => r._1 == 7L && r._2 == "v7-new"))
    assert(got.size == 398)
    // reads by range/key respect the mask too
    assert(st.readKeyRange(3L, 1L, 10L).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L))
    assert(st.readForKeys(3L, Seq(5L, 6L, 350L).toDF("k")).collect()
      .map(_.getLong(0)).toSet == Set(6L))
  }

  test("linked: compact folds the DV in; validate audits mask physics") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-compact").toString
    val st = new ManifestStore(spark, s"$root/c", "k")
    st.write(rows(1 to 500), 1L, numFiles = 5)
    st.deleteWhere(1L, 2L, col("k").isin(3L, 77L, 401L)): Unit
    assert(st.validate(2L).filter(col("status") =!= "ok").count() == 0,
      "a healthy DV version must validate clean")
    val want = contents(st.read(2L))
    st.compact(2L, 3L, minBytes = 1L << 30): Unit // everything is "small": full fold
    assert(contents(st.read(3L)) == want)
    val fs = fsOf(s"$root/c")
    assert(!fs.exists(new Path(s"$root/c/_manifests/v=3/_dv")),
      "compaction must fold the mask into the rewrite")
    // a corrupted mask (orphan file entry) fails validation loudly
    st.branch(2L, 4L)
    val dvDir = new Path(s"$root/c/_manifests/v=4/_dv")
    Seq(("no-such-file.parquet", 0L)).toDF("file", "pos")
      .coalesce(1).write.mode("overwrite").parquet(dvDir.toString)
    assert(st.validate(4L).filter(col("status") === "dv_orphan").count() == 1)
  }

  test("linked: diff and the change feed see DV-only deletes") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-diff").toString
    val st = new ManifestStore(spark, s"$root/f", "k")
    st.write(rows(1 to 200), 1L, numFiles = 2)
    st.deleteWhere(1L, 2L, col("k").isin(42L, 133L)): Unit
    val d = st.diff(1L, 2L).select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((42L, "delete"), (133L, "delete")),
      s"DV-only delete invisible to diff: $d")
    // and through the SQL change feed (rides the same diff)
    spark.conf.set("spark.sql.catalog.dvcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvcat.root", root)
    val feed = spark.sql("SELECT k, change_type FROM dvcat.f.changes VERSION AS OF '2..2'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((42L, "delete"), (133L, "delete")))
  }

  test("linked: branch and shallow clone carry the mask") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-br").toString
    val st = new ManifestStore(spark, s"$root/b", "k")
    st.write(rows(1 to 100), 1L, numFiles = 2)
    st.deleteWhere(1L, 2L, col("k") === 50L): Unit
    st.branch(2L, 5L)
    assert(!contents(st.read(5L)).exists(_._1 == 50L))
    val clone = st.cloneTo(s"$root/b2", 2L)
    assert(!contents(clone.read(1L)).exists(_._1 == 50L))
  }

  test("snapshot layout: DV delete byte-copies parts verbatim; merge carries and folds like linked") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-sn").toString
    val st = new SnapshotStore(spark, s"$root/s", "k")
    st.writeRangePartitioned(rows(1 to 1000), 1L, 4)
    val fs = fsOf(s"$root/s")
    def parts(v: Long): Set[(String, Long)] =
      fs.listStatus(new Path(s"$root/s/v=$v")).filter(_.getPath.getName.startsWith("part-"))
        .map(st0 => (st0.getPath.getName, st0.getLen)).toSet
    val (sharedN, rewrittenN, deleted) =
      st.deleteWhere(1L, 2L, col("k").isin(9L, 512L))
    assert((sharedN, rewrittenN, deleted) == ((4, 0, 2L)))
    // every part carried VERBATIM (same name + size — no decode/re-encode)
    assert(parts(2L) == parts(1L), "DV delete must byte-copy, not rewrite")
    assert(contents(st.read(2L)) == contents(st.read(1L)).filterNot(r => Set(9L, 512L)(r._1)))
    // zone-map pruned reads respect the mask
    assert(st.readKeyRange(2L, 500L, 520L).collect().map(_.getLong(0)).toSet
      == (500L to 520L).toSet - 512L)
    // merge on top: no resurrection, untouched files keep their entries
    st.mergeDelta(2L, 3L, Seq((513L, "n", 1.0)).toDF("k", "v", "x")): Unit
    val got = contents(st.read(3L))
    assert(!got.exists(_._1 == 512L) && !got.exists(_._1 == 9L))
    assert(got.exists(r => r._1 == 513L && r._2 == "n"))
    // dense delete on a DV version goes CoW and folds everything
    st.deleteWhere(3L, 4L, col("k") <= 500L, mode = "cow"): Unit
    assert(!fs.exists(new Path(s"$root/s/v=4/_dv")) ||
      spark.read.parquet(s"$root/s/v=4/_dv").count() > 0) // carried subset only
    assert(contents(st.read(4L)) == got.filter(_._1 > 500L))
  }

  test("foldDv rewrites ONLY masked files, drops the mask, preserves content (both layouts)") {
    // linked: untouched pool files carry BY NAME
    val root = java.nio.file.Files.createTempDirectory("graft-dv-fold").toString
    val lk = new ManifestStore(spark, s"$root/l", "k")
    lk.write(rows(1 to 400), 1L, numFiles = 4)
    lk.deleteWhere(1L, 2L, col("k").isin(5L, 7L)): Unit // mask on ONE file
    val want = contents(lk.read(2L))
    def files(v: Long) = lk.manifest(v).select("file").collect().map(_.getString(0)).toSet
    val (sharedN, rewrittenN, dropped) = lk.foldDv(2L, 3L)
    assert(dropped == 2L && rewrittenN >= 1)
    assert((files(2L) intersect files(3L)).size == sharedN,
      "untouched files must carry by reference")
    assert(contents(lk.read(3L)) == want)
    assert(!fsOf(s"$root/l").exists(new Path(s"$root/l/_manifests/v=3/_dv")))
    // snapshot: untouched parts byte-carry under their basename
    val sn = new SnapshotStore(spark, s"$root/s", "k")
    sn.writeRangePartitioned(rows(1 to 400), 1L, 4)
    sn.deleteWhere(1L, 2L, col("k").isin(5L, 7L)): Unit
    val want2 = contents(sn.read(2L))
    val (_, rw2, dr2) = sn.foldDv(2L, 3L)
    assert(dr2 == 2L && rw2 >= 1)
    assert(contents(sn.read(3L)) == want2)
    assert(!fsOf(s"$root/s").exists(new Path(s"$root/s/v=3/_dv")))
  }

  test("SQL: CALL restore publishes a new commit equal to the old version; CALL fold_dv drops the mask") {
    val root = java.nio.file.Files.createTempDirectory("graft_dv_sql").toString
    spark.conf.set("spark.sql.catalog.dvsql",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvsql.root", root)
    for ((t, linked) <- Seq(("t_lk", true), ("t_sn", false))) {
      if (linked) new ManifestStore(spark, s"$root/$t", "k")
        .write(rows(1 to 100), 1L, numFiles = 2)
      else new SnapshotStore(spark, s"$root/$t", "k")
        .writeRangePartitioned(rows(1 to 100), 1L, 2)
      spark.sql(s"DELETE FROM dvsql.$t WHERE k = 42") // sparse → DV
      // the masked TIP through SQL: the raw files still hold 100 rows,
      // the scan must serve 99 (this is the read that silently
      // over-counted before the masked V1 relation existed)
      assert(spark.sql(s"SELECT COUNT(*) FROM dvsql.$t").head().getLong(0) == 99L)
      assert(spark.sql(s"SELECT k FROM dvsql.$t WHERE k BETWEEN 40 AND 44")
        .collect().map(_.getLong(0)).toSet == Set(40L, 41L, 43L, 44L))
      // the .dv metadata table exposes the mask (file, pos) — the
      // observability half of merge-on-read
      assert(spark.sql(s"SELECT * FROM dvsql.$t.dv").count() == 1L)
      val r = spark.sql(s"CALL dvsql.fold_dv('$t')").collect().head
      assert(r.getLong(3) == 1L, s"$t: rows_dropped") // one masked row folded
      assert(spark.sql(s"SELECT COUNT(*) FROM dvsql.$t").head().getLong(0) == 99L)
      // the .dv metadata table shows the tip's mask, then empties
      val dvRows = spark.sql(s"SELECT * FROM dvsql.$t.dv").collect()
      assert(dvRows.isEmpty, s"$t: mask must be gone after fold_dv")
      // RESTORE to v1: tip content = pre-delete, history intact
      val rr = spark.sql(s"CALL dvsql.restore('$t', 1)").collect().head
      assert(rr.getLong(1) == 1L)
      assert(spark.sql(s"SELECT COUNT(*) FROM dvsql.$t").head().getLong(0) == 100L)
      assert(spark.sql(s"SELECT COUNT(*) FROM dvsql.$t VERSION AS OF 2")
        .head().getLong(0) == 99L, s"$t: history must stay intact")
    }
  }

  test("snapshot layout: diff sees DV deletes (full-content join)") {
    val root = java.nio.file.Files.createTempDirectory("graft-dv-snd").toString
    val st = new SnapshotStore(spark, s"$root/sd", "k")
    st.writeRangePartitioned(rows(1 to 100), 1L, 2)
    st.deleteWhere(1L, 2L, col("k") === 33L): Unit
    val d = st.diff(1L, 2L).select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((33L, "delete")))
  }
}
