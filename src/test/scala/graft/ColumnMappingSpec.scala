package graft

import org.apache.spark.sql.functions._

import graft.operators.{ManifestStore, SnapshotStore}

/** COLUMN MAPPING — the metadata-only RENAME COLUMN contract on both
  * layouts: a rename is one schema-sidecar commit (`graft.physical`
  * pins the stored name), not a table rewrite. Zero-rewrite gates,
  * read/merge/diff continuity, rename-then-rename, pruning
  * translation, SQL reads, and the physical-name collision guards. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def poolFiles(base: String): Map[String, Long] = {
    val d = new java.io.File(s"$base/files")
    d.listFiles().filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .map(f => f.getName -> f.length()).toMap
  }

  private def partFiles(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.length()).toMap
  }

  test("linked: RENAME is a metadata commit — pool bit-identical; read/merge/diff continue; rename-then-rename") {
    val root = java.nio.file.Files.createTempDirectory("graft_cm_lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k", statsCols = Seq("v"))
    st.write(Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z")).toDF("k", "v", "tag"),
      1L, 2, commitTs = Some(1000L))
    val before = poolFiles(s"$root/t")
    st.renameColumn(1L, 2L, "v", "price")
    // ZERO-REWRITE GATE: pool listing bit-identical, manifest rows verbatim
    assert(poolFiles(s"$root/t") == before, "rename touched the pool")
    assert(st.manifest(2L).select("file").collect().map(_.getString(0)).toSet
      == st.manifest(1L).select("file").collect().map(_.getString(0)).toSet)
    // reads resolve the mapping; pinned history keeps the old name
    assert(st.read(2L).columns.toSeq.sorted == Seq("k", "price", "tag"))
    assert(st.read(2L).select("k", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    assert(st.read(1L).columns.toSeq.sorted == Seq("k", "tag", "v"))
    // rename → MERGE: a delta in the renamed schema lands (physical
    // names under the hood), and the merged read serves logical names
    st.mergeDelta(2L, 3L, Seq((2L, 21.0, "y2"), (4L, 40.0, "w")).toDF("k", "price", "tag"))
    assert(st.read(3L).select("k", "price", "tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      == Set((1L, 10.0, "x"), (2L, 21.0, "y2"), (3L, 30.0, "z"), (4L, 40.0, "w")))
    // rename → DIFF: classification in logical names, update detected
    val d = st.diff(2L, 3L).select("k", "price", "change_type").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(d == Set((2L, 21.0, "update"), (4L, 40.0, "insert")))
    // stats pruning translates: readWhere on the NEW name prunes
    // through the manifest's physical min_v/max_v envelopes
    assert(st.readWhere(3L, "price", 15.0, 25.0).select("k").collect()
      .map(_.getLong(0)).toSet == Set(2L))
    // rename-then-rename: the physical pin survives the second hop
    st.renameColumn(3L, 4L, "price", "amount")
    assert(st.read(4L).select("k", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 21.0), (3L, 30.0), (4L, 40.0)))
    // collision guards: the retired logical name still shadows bytes
    val e1 = intercept[IllegalArgumentException](st.renameColumn(4L, 5L, "tag", "v"))
    assert(e1.getMessage.contains("PHYSICAL"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      st.mergeDelta(4L, 5L, Seq((9L, 90.0, "q", 1.0)).toDF("k", "amount", "tag", "v")))
    assert(e2.getMessage.contains("PHYSICAL"), e2.getMessage)
  }

  test("linked: rename → updateWhere MoR — predicate on the RENAMED column matches, updated rows carry values (not NULL)") {
    // the r14 advisor's corruption class: updateWhere scanning with the
    // LOGICAL schema over physical-named pool files read the mapped
    // column as NULL — the predicate silently matched nothing and a
    // MoR landing carried NULL in the renamed column. Must now mirror
    // deleteWhere: physical scan, logical projection, THEN predicate.
    val root = java.nio.file.Files.createTempDirectory("graft_cm_uw").toString
    val st = new ManifestStore(spark, s"$root/t", "k", statsCols = Seq("v"))
    st.write(Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z"),
      (4L, 40.0, "w"), (5L, 50.0, "u")).toDF("k", "v", "tag"), 1L, 2)
    st.renameColumn(1L, 2L, "v", "price")
    // MoR update keyed on the RENAMED column
    val (_, _, n) = st.updateWhere(2L, 3L, col("price") > 25.0,
      Map("tag" -> lit("hi")), mode = "mor")
    assert(n == 3L, s"predicate on renamed column matched $n rows, expected 3")
    val got = st.read(3L).select("k", "price", "tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == Set((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "hi"),
      (4L, 40.0, "hi"), (5L, 50.0, "hi")), got.toString)
    // and updating the renamed column itself lands real values
    val (_, _, n2) = st.updateWhere(3L, 4L, col("k") === 1L,
      Map("price" -> (col("price") + 1.0)), mode = "mor")
    assert(n2 == 1L)
    assert(st.read(4L).filter(col("k") === 1L).select("price").head().getDouble(0) == 11.0)
    // CoW branch parity on the same chain
    val (_, _, n3) = st.updateWhere(4L, 5L, col("price") === 20.0,
      Map("tag" -> lit("cw")), mode = "cow")
    assert(n3 == 1L)
    assert(st.read(5L).filter(col("k") === 2L).select("tag").head().getString(0) == "cw")
  }

  test("snapshot: RENAME byte-carries files (names+sizes equal); read/merge/diff; DV composes") {
    val root = java.nio.file.Files.createTempDirectory("graft_cm_sn").toString
    val st = new SnapshotStore(spark, s"$root/t", "k")
    st.writeRangePartitioned(
      Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z")).toDF("k", "v", "tag"),
      1L, 2, statsCols = Seq("v"), commitTs = Some(1000L))
    // a merge-on-read delete first: the DV must carry through the rename
    st.deleteWhere(1L, 2L, col("k") === 3L, mode = "dv"): Unit
    val before = partFiles(s"$root/t/v=2")
    st.renameColumn(2L, 3L, "v", "price")
    // ZERO-REWRITE GATE: part names+sizes equal (byte-copy carry)
    assert(partFiles(s"$root/t/v=3") == before, "rename re-encoded data files")
    // masked row stays masked; mapping resolves
    assert(st.read(3L).select("k", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 20.0)))
    assert(st.read(2L).columns.contains("v"), "pinned history lost the old name")
    // rename → MERGE → read; rename → DIFF
    st.mergeDelta(3L, 4L, Seq((2L, 21.0, "y2")).toDF("k", "price", "tag")): Unit
    assert(st.read(4L).select("k", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 21.0)))
    assert(st.diff(3L, 4L).select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((2L, "update")))
    // zone-map pruning translates to the physical stats columns
    assert(st.readWhere(4L, "price", 15.0, 25.0).select("k").collect()
      .map(_.getLong(0)).toSet == Set(2L))
    // a full rewrite FOLDS the mapping: compact materializes logical
    // names and drops the sidecar pin
    st.compact(4L, targetBytes = 1L << 30): Unit
    val folded = st.evolvedSchema(4L)
    assert(folded.isEmpty || !SnapshotStore.hasMapping(folded.get),
      s"compact left the mapping: $folded")
    assert(st.read(4L).select("k", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 10.0), (2L, 21.0)))
  }

  test("SQL: RENAME COLUMN is metadata-only on both layouts and SQL reads resolve the mapping") {
    val root = java.nio.file.Files.createTempDirectory("graft_cm_sql").toString
    org.apache.spark.sql.graft.GraftExtensions.register(spark) // UPDATE strategy
    spark.conf.set("spark.sql.catalog.cmcat",
      classOf[org.apache.spark.sql.graft.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmcat.root", root)
    val data = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val snap = new SnapshotStore(spark, s"$root/sq_snap", "k")
    snap.writeRangePartitioned(data, 1L, 2, commitTs = Some(1000L))
    val linked = new ManifestStore(spark, s"$root/sq_linked", "k")
    linked.write(data, 1L, 2, commitTs = Some(1000L))
    val poolBefore = poolFiles(s"$root/sq_linked")
    for (t <- Seq("sq_snap", "sq_linked")) {
      spark.sql(s"ALTER TABLE cmcat.$t RENAME COLUMN v TO price")
      assert(spark.sql(s"SELECT k, price FROM cmcat.$t").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
        == Set((1L, 10.0), (2L, 20.0)), t)
      // aggregates and filters push through the mapped read
      assert(spark.sql(s"SELECT SUM(price) s FROM cmcat.$t WHERE price > 15")
        .head().getDouble(0) == 20.0, t)
      // SQL DML continues on the renamed tip
      spark.sql(s"UPDATE cmcat.$t SET price = price + 1 WHERE k = 1")
      assert(spark.sql(s"SELECT price FROM cmcat.$t WHERE k = 1")
        .head().getDouble(0) == 11.0, t)
    }
    assert(poolFiles(s"$root/sq_linked").keySet
      .intersect(poolBefore.keySet) == poolBefore.keySet,
      "SQL RENAME rewrote carried pool files")
    // the rename itself added nothing to the pool (the UPDATE did)
    assert(poolBefore.forall { case (n, sz) => poolFiles(s"$root/sq_linked")(n) == sz })
  }
}
