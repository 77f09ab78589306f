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
}
