package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{ManifestStore, SnapshotStore}

/** Hive-style table partitioning on both store layouts — the
  * Delta/Iceberg `PARTITIONED BY` contract: a declared partition
  * column set, one partition tuple per data file (so partition
  * predicates prune EXACTLY at the metadata level), dynamic partition
  * overwrite (`replaceWhere`), and partition drops — metadata-only on
  * the linked layout (the nightly retention verb of a date-partitioned
  * 100 TB lake: not one data byte moves), survivor byte-copies on the
  * dir-per-version layout (its carry contract). */
class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: String) = new Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val cats = Seq("alpha", "beta", "gamma", "delta")

  private def rows(ks: Range) = ks.map { k =>
    (k.toLong, cats(k % 4), k * 10.0)
  }.toDF("k", "cat", "x")

  private def contents(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select("k", "cat", "x").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  private def poolListing(base: String): Set[(String, Long)] = {
    val fs = fsOf(base)
    fs.listStatus(new Path(s"$base/files"))
      .map(st => (st.getPath.getName, st.getLen)).toSet
  }

  // ---------------------------------------------------------- linked

  test("linked: partitioned write — one tuple per file, exact manifest stats, partitions()") {
    val root = java.nio.file.Files.createTempDirectory("graft-part-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"), filesPerPartition = 2)
    assert(st.storedPartitionBy() == Seq("cat"))
    val man = st.manifest(1L)
    assert(man.filter(col("min_cat") =!= col("max_cat")).count() == 0,
      "every pool file must hold exactly one partition value")
    val parts = st.partitions(1L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(parts.keySet == cats.toSet)
    assert(parts.values.map(_._2).sum == 400L)
    assert(parts.values.forall { case (f, _) => f >= 1 && f <= 2 },
      s"filesPerPartition=2 must bound files per tuple, got $parts")
    // partition-equality read prunes at the manifest and matches the filter
    val got = contents(st.readWhere(1L, "cat", "beta", "beta"))
    assert(got == contents(st.read(1L).filter(col("cat") === "beta")))
    assert(got.nonEmpty && got.forall(_._2 == "beta"))
  }

  test("linked: replaceWhere overwrites ONLY touched partitions; untouched carry by reference") {
    val root = java.nio.file.Files.createTempDirectory("graft-repl-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"))
    def fileSet(v: Long, c: String) = st.manifest(v)
      .filter(col("min_cat") === c).select("file")
      .collect().map(_.getString(0)).toSet
    // the backfill: partition 'beta' re-lands with doubled x
    val backfill = rows(1 to 400).filter(col("cat") === "beta")
      .withColumn("x", col("x") * 2)
    val (carried, replaced, fresh) = st.replaceWhere(1L, 2L, backfill)
    assert(carried == 3 && replaced == 1 && fresh >= 1, s"($carried,$replaced,$fresh)")
    // untouched partitions: same pool files BY REFERENCE (zero copies)
    for (c <- Seq("alpha", "gamma", "delta"))
      assert(fileSet(2L, c) == fileSet(1L, c), s"partition $c must carry by reference")
    assert((fileSet(2L, "beta") intersect fileSet(1L, "beta")).isEmpty)
    val want = contents(st.read(1L)).map {
      case (k, "beta", x) => (k, "beta", x * 2)
      case r => r
    }
    assert(contents(st.read(2L)) == want)
    // history pinned
    assert(contents(st.read(1L)).exists { case (_, c, x) => c == "beta" && x % 20 != 0 })
  }

  test("linked: dropPartitions is METADATA-ONLY — zero data bytes move; vacuum reclaims later") {
    val root = java.nio.file.Files.createTempDirectory("graft-drop-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"))
    val before = poolListing(s"$root/t")
    val (carried, dropped, rowsDropped) =
      st.dropPartitions(1L, 2L, col("cat") === "gamma")
    assert(carried == 3 && dropped == 1 && rowsDropped == 100L)
    assert(poolListing(s"$root/t") == before,
      "a partition drop must write/move ZERO data bytes")
    assert(contents(st.read(2L)) == contents(st.read(1L)).filterNot(_._2 == "gamma"))
    // retention then reclaims the dropped partition's bytes by ref-count
    st.prune(keep = Seq(2L)): Unit
    assert(poolListing(s"$root/t").size < before.size,
      "after prune+vacuum the dropped partition's files must reclaim")
    assert(contents(st.read(2L)).size == 300)
  }

  test("linked: mergeDelta PRESERVES the partition invariant; drops still metadata-only after") {
    val root = java.nio.file.Files.createTempDirectory("graft-md-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"))
    val delta = Seq((401L, "beta", 1.0), (402L, "delta", 2.0), (7L, "delta", 70.5))
      .toDF("k", "cat", "x")
    st.mergeDelta(1L, 2L, delta): Unit
    val man = st.manifest(2L)
    assert(man.filter(col("min_cat") =!= col("max_cat")).count() == 0,
      "mergeDelta on a partitioned store must land one-tuple-per-file")
    val want = contents(st.read(1L)).filterNot(_._1 == 7L) ++
      Set((401L, "beta", 1.0), (402L, "delta", 2.0), (7L, "delta", 70.5))
    assert(contents(st.read(2L)) == want)
    val before = poolListing(s"$root/t")
    st.dropPartitions(2L, 3L, col("cat") === "delta"): Unit
    assert(poolListing(s"$root/t") == before)
    assert(contents(st.read(3L)) == want.filterNot(_._2 == "delta"))
  }

  test("linked: a deletion vector carries only for SURVIVING partitions across a drop") {
    val root = java.nio.file.Files.createTempDirectory("graft-dvp-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"))
    // sparse mask touching one alpha row and one gamma row
    st.deleteWhere(1L, 2L, col("k").isin(4L, 2L), mode = "dv"): Unit
    assert(st.dvFrame(2L).map(_.count()) == Some(2L))
    st.dropPartitions(2L, 3L, col("cat") === "alpha"): Unit
    // k=4 is alpha (4%4==0) — its mask entry must NOT survive the drop;
    // k=2 is gamma — its mask entry must
    assert(st.dvFrame(3L).map(_.count()) == Some(1L))
    val got = contents(st.read(3L))
    assert(!got.exists(_._1 == 2L) && !got.exists(_._2 == "alpha"))
    assert(got.size == 299)
  }

  test("linked: redeclaring different partition columns fails; zorder on partitioned store fails") {
    val root = java.nio.file.Files.createTempDirectory("graft-guard-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 40), 1L, Seq("cat"))
    val e = intercept[IllegalArgumentException] {
      st.writePartitioned(rows(41 to 80), 2L, Seq("x"))
    }
    assert(e.getMessage.contains("already partitioned"))
    // z-ordering ON a partition column is pointless (constant per file)
    val z = intercept[IllegalArgumentException] {
      st.writeZOrdered(rows(41 to 80), 2L, 2, Seq("cat", "x"))
    }
    assert(z.getMessage.contains("partition column"))
    // schema verbs may not orphan the partition spec
    val dc = intercept[UnsupportedOperationException] {
      st.dropColumns(1L, 2L, Seq("cat"))
    }
    assert(dc.getMessage.contains("partition column"))
    val rc = intercept[IllegalArgumentException] {
      st.renameColumn(1L, 2L, "cat", "category")
    }
    assert(rc.getMessage.contains("partition column"))
  }

  test("linked: MULTI-column partitioning — tuple-exact listing, drop by conjunction, 2-col prune") {
    val root = java.nio.file.Files.createTempDirectory("graft-part2-lk").toString
    val st = new ManifestStore(spark, s"$root/t", "k")
    val df = (1 to 200).map { k =>
      (k.toLong, cats(k % 2), s"g${k % 3}", k * 1.0)
    }.toDF("k", "cat", "grp", "x")
    st.writePartitioned(df, 1L, Seq("cat", "grp"))
    val parts = st.partitions(1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(parts.size == 6 && parts.values.sum == 200L)
    // conjunction drop removes exactly one of the six tuples
    val (carried, dropped, rows) = st.dropPartitions(1L, 2L,
      col("cat") === "alpha" && col("grp") === "g1")
    assert(dropped >= 1 && rows == parts(("alpha", "g1")) && carried >= 5)
    assert(st.read(2L).filter(col("cat") === "alpha" && col("grp") === "g1").count() == 0)
    assert(st.read(2L).count() == 200L - rows)
    // 2-column conjunction read prunes on BOTH partition dimensions
    val got = st.readWhereAll(2L,
      Seq(("cat", "beta", "beta"), ("grp", "g2", "g2")))
    assert(got.count() ==
      st.read(2L).filter(col("cat") === "beta" && col("grp") === "g2").count())
  }

  test("linked: Z-ORDER WITHIN PARTITIONS — one tuple per file, z ranges split inside each") {
    val root = java.nio.file.Files.createTempDirectory("graft-zp-lk").toString
    // statsCols carry the z dims; cat partitions; (k, x) z-cluster inside
    val st = new ManifestStore(spark, s"$root/t", "k", statsCols = Seq("x"))
    st.writePartitioned(rows(1 to 40), 1L, Seq("cat"))
    // OPTIMIZE ZORDER BY: re-cluster the tip within partitions (v2)
    st.writeZOrdered(st.read(1L), 2L, numFiles = 16, zCols = Seq("k", "x"))
    val man = st.manifest(2L)
    assert(man.filter(col("min_cat") =!= col("max_cat")).count() == 0,
      "z-order within partitions must preserve one-tuple-per-file")
    // partition verbs still work on the z-ordered version
    val parts = st.partitions(2L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(parts == cats.map(_ -> 10L).toMap)
    // conjunction read: partition equality prunes exactly, x band
    // skips within the partition; result equals the plain filter
    val got = st.readWhereAll(2L, Seq(("cat", "beta", "beta"), ("x", 100.0, 200.0)))
      .select("k").collect().map(_.getLong(0)).toSet
    val want = st.read(2L)
      .filter(col("cat") === "beta" && col("x").between(100.0, 200.0))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
    // drops stay metadata-only on the z-ordered partitioned version
    val before = poolListing(s"$root/t")
    st.dropPartitions(2L, 3L, col("cat") === "alpha"): Unit
    assert(poolListing(s"$root/t") == before)
  }

  // -------------------------------------------------------- snapshot

  test("snapshot: partitioned write — exact zone-map stats, partitions(), exact pruning") {
    val root = java.nio.file.Files.createTempDirectory("graft-part-sn").toString
    val st = new SnapshotStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"), filesPerPartition = 2)
    assert(st.storedPartitionBy() == Seq("cat"))
    val zm = st.zoneMap(1L).get
    assert(zm.filter(col("min_cat") =!= col("max_cat")).count() == 0)
    val parts = st.partitions(1L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(parts == cats.map(_ -> 100L).toMap)
    // prunedFilesBy on the partition column selects EXACTLY that
    // partition's files — the scan-bound assertion
    val betaFiles = st.partitions(1L).filter(col("cat") === "beta")
      .head().getLong(1)
    assert(st.prunedFilesBy(1L, "cat", "beta", "beta").get.size == betaFiles)
    assert(contents(st.readWhere(1L, "cat", "beta", "beta")) ==
      contents(st.read(1L).filter(col("cat") === "beta")))
  }

  test("snapshot: replaceWhere + dropPartitions semantics on the dir-per-version layout") {
    val root = java.nio.file.Files.createTempDirectory("graft-repl-sn").toString
    val st = new SnapshotStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"))
    val backfill = rows(1 to 400).filter(col("cat") === "beta")
      .withColumn("x", col("x") * 2)
    val (carried, replaced, fresh) = st.replaceWhere(1L, 2L, backfill)
    assert(carried == 3 && replaced == 1 && fresh >= 1)
    val want = contents(st.read(1L)).map {
      case (k, "beta", x) => (k, "beta", x * 2)
      case r => r
    }
    assert(contents(st.read(2L)) == want)
    // carried files keep their basenames (byte-copy carry contract)
    val fs = fsOf(s"$root/t")
    def names(v: Long) = fs.listStatus(new Path(s"$root/t/v=$v"))
      .map(_.getPath.getName).filter(_.startsWith("part-")).toSet
    assert((names(1L) intersect names(2L)).size == carried)
    val (c2, d2, r2) = st.dropPartitions(2L, 3L, col("cat") === "gamma")
    assert(c2 == 3 && d2 == 1 && r2 == 100L)
    assert(contents(st.read(3L)) == want.filterNot(_._2 == "gamma"))
    // prune carried over: zone map re-homed onto v=3
    assert(st.prunedFilesBy(3L, "cat", "alpha", "alpha").get
      .forall(_.contains("/v=3/")))
  }

  test("snapshot: Z-order within partitions — invariant holds, 2-dim conjunction prunes") {
    val root = java.nio.file.Files.createTempDirectory("graft-zp-sn").toString
    val st = new SnapshotStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 40), 1L, Seq("cat"))
    st.writeZOrdered(st.read(1L), 2L, numFiles = 16, zCols = Seq("k", "x"))
    val zm = st.zoneMap(2L).get
    assert(zm.filter(col("min_cat") =!= col("max_cat")).count() == 0,
      "z-order within partitions must preserve one-tuple-per-file")
    assert(st.partitions(2L).collect().map(r => r.getString(0) -> r.getLong(2)).toMap ==
      cats.map(_ -> 10L).toMap)
    val got = st.readWhereAll(2L, Seq(("cat", "beta", "beta"), ("x", 100.0, 200.0)))
      .select("k").collect().map(_.getLong(0)).toSet
    val want = st.read(2L)
      .filter(col("cat") === "beta" && col("x").between(100.0, 200.0))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("snapshot: mergeDelta preserves the invariant; partitions() stays exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-md-sn").toString
    val st = new SnapshotStore(spark, s"$root/t", "k")
    st.writePartitioned(rows(1 to 400), 1L, Seq("cat"))
    val delta = Seq((401L, "beta", 1.0), (7L, "delta", 70.5)).toDF("k", "cat", "x")
    st.mergeDelta(1L, 2L, delta): Unit
    val zm = st.zoneMap(2L).get
    assert(zm.filter(col("min_cat") =!= col("max_cat")).count() == 0)
    val parts = st.partitions(2L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // k=7 was already a delta-partition row: the upsert replaces it in
    // place, so delta stays at 100 while beta gains the new k=401
    assert(parts("beta") == 101L && parts("delta") == 100L && parts("alpha") == 100L)
    val want = contents(st.read(1L)).filterNot(_._1 == 7L) ++
      Set((401L, "beta", 1.0), (7L, "delta", 70.5))
    assert(contents(st.read(2L)) == want)
  }
}
