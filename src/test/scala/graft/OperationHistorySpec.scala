package graft

import org.apache.spark.sql.functions._

import graft.operators.{ManifestStore, SnapshotStore}

/** DESCRIBE HISTORY operation metadata: every commit stamps its VERB
  * (+ parameters) into the per-version `_op.json` sidecar and the
  * version-log checkpoint, served through `history()` — the audit
  * question "what did commit N do". Pre-upgrade commits (no sidecar)
  * report `unknown` honestly; metadata-only commits (rename / widen /
  * branch / restore) REUSE the predecessor's checkpoint stats instead
  * of re-opening every data file's footer (the r14 advisor's O(N)
  * finding). */
class OperationHistorySpec extends SparkSpec {
  import spark.implicits._

  private def ops(st: => org.apache.spark.sql.DataFrame): Map[Long, (String, String)] =
    st.collect().map(r => r.getLong(0) ->
      (r.getString(r.fieldIndex("operation")),
        r.getString(r.fieldIndex("operation_params")))).toMap

  test("linked: write→merge→delete→update→rename→compact chain reports verbs + params; self-heal preserves them") {
    val base = java.nio.file.Files.createTempDirectory("graft_oph_lk").toString + "/t"
    val st = new ManifestStore(spark, base, "k", statsCols = Seq("v"))
    st.write(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v"), 1L, 2)
    st.mergeDelta(1L, 2L, Seq((2L, 21.0), (5L, 50.0)).toDF("k", "v"))
    st.deleteWhere(2L, 3L, col("v") > 45.0, mode = "cow")
    st.updateWhere(3L, 4L, col("k") === 1L, Map("v" -> lit(11.0)), mode = "mor")
    st.renameColumn(4L, 5L, "v", "price")
    st.compact(5L, 6L, minBytes = 1L << 30)
    val h = ops(st.history())
    assert(h(1L)._1 == "write", h(1L).toString)
    assert(h(2L)._1 == "mergeDelta")
    assert(h(3L)._1 == "deleteWhere" && h(3L)._2.contains("v"), h(3L).toString)
    assert(h(4L)._1 == "updateWhere" && h(4L)._2.startsWith("SET v WHERE"), h(4L).toString)
    assert(h(5L)._1 == "renameColumn" && h(5L)._2 == "v -> price", h(5L).toString)
    assert(h(6L)._1 == "compact")
    // SELF-HEAL keeps the verbs: drop the checkpoint wholesale — the
    // rebuild re-reads each version's _op.json sidecar, not "unknown"
    assert(new java.io.File(base, "_history.json").delete())
    assert(ops(st.history()) == h, "rebuild lost operation metadata")
    // PRE-UPGRADE honesty: a version whose sidecar is missing (older
    // writer) reports unknown after a rebuild, never a guess
    val man3 = new java.io.File(base, "_manifests/v=3/_op.json")
    assert(man3.exists() && man3.delete())
    assert(new java.io.File(base, "_history.json").delete())
    val healed = ops(st.history())
    assert(healed(3L) == ("unknown", ""), healed(3L).toString)
    assert(healed(2L)._1 == "mergeDelta")
  }

  test("snapshot: verbs + params served; restore/branch chains stamp their source") {
    val base = java.nio.file.Files.createTempDirectory("graft_oph_sn").toString + "/t"
    val st = new SnapshotStore(spark, base, "k")
    st.writeRangePartitioned(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), 1L, 2)
    st.mergeDelta(1L, 2L, Seq((2L, "b2")).toDF("k", "v"))
    st.deleteWhere(2L, 3L, col("k") === 3L)
    st.restoreVersion(2L, 4L)
    val h = ops(st.history())
    assert(h(1L)._1 == "writeRangePartitioned" || h(1L)._1 == "write", h(1L).toString)
    assert(h(2L)._1 == "mergeDelta")
    assert(h(3L)._1 == "deleteWhere" && h(3L)._2.nonEmpty)
    assert(h(4L) == ("restoreVersion", "of v2"), h(4L).toString)
  }

  test("metadata-only commits REUSE the predecessor's checkpoint stats (no footer re-opens) and record bytes_added = 0") {
    val base = java.nio.file.Files.createTempDirectory("graft_oph_mo").toString + "/t"
    val st = new SnapshotStore(spark, base, "k")
    st.writeRangePartitioned(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v"), 1L, 2)
    // POISON the predecessor's checkpoint row-count: if the rename's
    // noteCommit recomputed from parquet footers it would land the
    // TRUE count — landing the poisoned value proves the O(1) reuse
    val hist = new java.io.File(base, "_history.json")
    val txt = scala.io.Source.fromFile(hist).mkString
    val poisoned = txt.replaceFirst("\"r\": 3", "\"r\": 999999")
    assert(poisoned != txt, s"poison failed: $txt")
    val w = new java.io.FileWriter(hist); w.write(poisoned); w.close()
    // Hadoop's checksummed local FS would reject the hand-edited file
    new java.io.File(base, "._history.json.crc").delete(): Unit
    st.renameColumn(1L, 2L, "v", "price")
    val raw = scala.io.Source.fromFile(hist).mkString
    assert(raw.contains("\"v\": 2, ") && raw.split("\\{").exists(s =>
      s.contains("\"v\": 2,") && s.contains("\"r\": 999999") && s.contains("\"b\": 0")),
      s"rename did not reuse the checkpoint entry: $raw")
    assert(raw.split("\\{").exists(s =>
      s.contains("\"v\": 2,") && s.contains("\"op\": \"renameColumn\"")), raw)
    // self-heal still rebuilds TRUTH (the checkpoint is a cache): drop
    // it and the served history carries the real counts + the verb
    assert(hist.delete())
    val healed = st.history().collect().map(r =>
      (r.getLong(0), r.getLong(3), r.getString(4))).toSet
    assert(healed == Set((1L, 3L, "write"), (2L, 3L, "renameColumn")),
      healed.toString)
    // linked twin: rename + widen + branch all reuse (bytes_added = 0)
    val lb = java.nio.file.Files.createTempDirectory("graft_oph_ml").toString + "/t"
    val lst = new ManifestStore(spark, lb, "k", statsCols = Seq("v"))
    lst.write(Seq((1L, 1), (2L, 2)).toDF("k", "v"), 1L, 2)
    val lh = new java.io.File(lb, "_history.json")
    val ltxt = scala.io.Source.fromFile(lh).mkString
    val lw = new java.io.FileWriter(lh)
    lw.write(ltxt.replaceFirst("\"r\": 2", "\"r\": 777777")); lw.close()
    new java.io.File(lb, "._history.json.crc").delete(): Unit
    lst.renameColumn(1L, 2L, "v", "price")
    lst.widenColumn(2L, 3L, "price", org.apache.spark.sql.types.LongType)
    lst.branch(3L, 4L)
    val lraw = scala.io.Source.fromFile(lh).mkString
    for (v <- Seq(2, 3, 4))
      assert(lraw.split("\\{").exists(s =>
        s.contains(s""""v": $v,""") && s.contains("\"r\": 777777")
          && s.contains("\"b\": 0")),
        s"v$v did not reuse the poisoned predecessor entry: $lraw")
  }

  test("snapshot restore records the bytes it physically copied — never a free commit") {
    // the stats-carry shortcut reuses the SOURCE version's counts, but
    // bytes come from the basename diff vs the retained predecessor:
    // restoreVersion copies a whole dir (nonzero), rename byte-carries
    // under the same basenames (zero) — byte-paced change-feed
    // admission must not treat a large restore as free
    val base = java.nio.file.Files.createTempDirectory("graft_oph_rb").toString + "/t"
    val st = new SnapshotStore(spark, base, "k")
    st.writeRangePartitioned((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, 2)
    st.mergeDelta(1L, 2L, Seq((1L, "patched")).toDF("k", "v"))
    st.restoreVersion(1L, 3L)
    assert(st.commitBytes(3L) > 0L,
      "restore copied data files: bytes_added must be nonzero")
    st.renameColumn(3L, 4L, "v", "w")
    assert(st.commitBytes(4L) == 0L,
      "rename byte-carries the same basenames: bytes_added must stay 0")
  }

  private def metricsOf(h: org.apache.spark.sql.DataFrame): Map[Long, Map[String, Long]] =
    h.collect().map(r => r.getLong(0) ->
      r.getAs[Map[String, Long]]("operation_metrics")).toMap

  test("operationMetrics: merge's inserted/updated/deleted split + delete/update row counts, recorded at commit (both layouts)") {
    // chain per layout: write 4 rows → MERGE (update k=2, insert
    // k=5..6, delete k=4) → DELETE one row → UPDATE one row. Every
    // row metric is declaratively known; file metrics assert presence
    // (layout-dependent counts stay unpinned).
    val rows = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    val delta = Seq((2L, 21.0), (5L, 50.0), (6L, 60.0))
    def check(h: Map[Long, Map[String, Long]], layout: String): Unit = {
      assert(h(1L).get("numFiles").exists(_ > 0), s"$layout v1: ${h(1L)}")
      val m = h(2L)
      assert(m.get("numTargetRowsUpdated").contains(1L), s"$layout v2: $m")
      assert(m.get("numTargetRowsInserted").contains(2L), s"$layout v2: $m")
      assert(m.get("numTargetRowsDeleted").contains(1L), s"$layout v2: $m")
      assert(m.get("numTargetFilesAdded").exists(_ > 0), s"$layout v2: $m")
      assert(h(3L).get("numDeletedRows").contains(1L), s"$layout v3: ${h(3L)}")
      assert(h(4L).get("numUpdatedRows").contains(1L), s"$layout v4: ${h(4L)}")
    }
    val lb = java.nio.file.Files.createTempDirectory("graft_opm_lk").toString + "/t"
    val lst = new ManifestStore(spark, lb, "k", statsCols = Seq("v"))
    lst.write(rows.toDF("k", "v"), 1L, 2)
    lst.mergeDelta(1L, 2L, delta.toDF("k", "v"),
      deleteKeys = Some(Seq(4L).toDF("k")))
    lst.deleteWhere(2L, 3L, col("k") === 3L, mode = "cow")
    lst.updateWhere(3L, 4L, col("k") === 1L, Map("v" -> lit(11.0)), mode = "mor")
    check(metricsOf(lst.history()), "linked")
    val sb = java.nio.file.Files.createTempDirectory("graft_opm_sn").toString + "/t"
    val sst = new SnapshotStore(spark, sb, "k")
    sst.writeRangePartitioned(rows.toDF("k", "v"), 1L, 2)
    sst.mergeDelta(1L, 2L, delta.toDF("k", "v"),
      deleteKeys = Some(Seq(4L).toDF("k")))
    sst.deleteWhere(2L, 3L, col("k") === 3L, mode = "cow")
    sst.updateWhere(3L, 4L, col("k") === 1L, Map("v" -> lit(11.0)), mode = "mor")
    val sh = metricsOf(sst.history())
    check(sh, "snapshot")
    // MoR delete metrics: the DV path reports the same row count with
    // zero file churn, plus the masks-touched gauge
    sst.deleteWhere(4L, 5L, col("k") === 2L, mode = "dv")
    val dv = metricsOf(sst.history())(5L)
    assert(dv.get("numDeletedRows").contains(1L), dv.toString)
    assert(dv.get("numRemovedFiles").contains(0L), dv.toString)
    assert(dv.get("numDeletionVectorsUpdated").exists(_ > 0), dv.toString)
    // SELF-HEAL carries metrics: the checkpoint is a cache — rebuild
    // re-reads each _op.json sidecar, metrics intact
    assert(new java.io.File(sb, "_history.json").delete())
    assert(metricsOf(sst.history()) == metricsOf(sst.history()))
    assert(metricsOf(sst.history())(2L).get("numTargetRowsUpdated").contains(1L))
    // PRE-UPGRADE sidecar (no metrics object) parses to an EMPTY map,
    // through both the sidecar reader and the checkpoint round-trip
    val op3 = new java.io.File(sb, "v=3/_op.json")
    val w3 = new java.io.FileWriter(op3)
    w3.write("""{"op": "deleteWhere", "params": "k = 3"}"""); w3.close()
    new java.io.File(sb, "v=3/._op.json.crc").delete(): Unit
    assert(new java.io.File(sb, "_history.json").delete())
    val healed = metricsOf(sst.history())
    assert(healed(3L) == Map.empty[String, Long], healed(3L).toString)
    assert(healed(2L).get("numTargetRowsDeleted").contains(1L))
  }
}
