package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.ChunkStore

class ChunkStoreSpec extends SparkSpec {
  import spark.implicits._

  private val master = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)

  // payloads long enough to CDC-chunk into several pieces; v2 edits
  // id 1, v3 drops id 2 and appends to id 3 — so refs are shared
  // across versions exactly like daily backups of a mutating corpus
  private def payloadRows(edit1: Boolean, drop2: Boolean, append3: Boolean) = {
    def body(seed: Int) = (0 until 40).map(i => s"block-$seed-$i").mkString(" ")
    Seq(
      Some(1L -> (if (edit1) "EDITED " + body(1) else body(1))),
      if (drop2) None else Some(2L -> body(2)),
      Some(3L -> (if (append3) body(3) + " APPENDED TAIL" else body(3)))
    ).flatten.toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("payload"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Byte]] =
    df.select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

  test("backup dedups refs across versions; every version restores byte-identical") {
    val base = Files.createTempDirectory("graft_chunkstore").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 8)
    val (v1, v2, v3) = (payloadRows(false, false, false),
      payloadRows(true, false, false), payloadRows(true, true, true))
    val (added1, _) = store.backup(v1, "id", "payload", 1L)
    val (added2, _) = store.backup(v2, "id", "payload", 2L)
    val (added3, _) = store.backup(v3, "id", "payload", 3L)
    assert(store.versions() == Seq(1L, 2L, 3L))
    // v2/v3 reuse the unchanged payloads' chunks: far fewer new refs
    // than v1's full ingest, and the repository holds each ref once
    assert(added1 > 0 && added2 < added1 && added3 < added1,
      s"added: $added1/$added2/$added3")
    assert(store.refs().count() == added1 + added2 + added3)
    assert(store.refs().select("ref_hex").distinct().count() == added1 + added2 + added3)
    // a re-backup of identical content adds zero refs
    val (added4, bytes4) = store.backup(payloadRows(true, true, true), "id", "payload", 4L)
    assert(added4 == 0L && bytes4 == 0L)
    assert(canon(store.restore(1L)) == canon(v1))
    assert(canon(store.restore(2L)) == canon(v2))
    assert(canon(store.restore(3L)) == canon(v3))
  }

  test("pruneChunks reclaims exactly the pruned version's exclusive bytes; survivors restore intact") {
    val base = Files.createTempDirectory("graft_chunkstore_gc").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 8)
    val (v1, v2, v3) = (payloadRows(false, false, false),
      payloadRows(true, false, false), payloadRows(true, true, true))
    store.backup(v1, "id", "payload", 1L)
    store.backup(v2, "id", "payload", 2L)
    store.backup(v3, "id", "payload", 3L)
    val acct = store.accounting().collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("exclusive_bytes")).toMap
    val refsBefore = store.refs().count()
    val bytesBefore = store.refs().agg(sum("bytes")).head().getLong(0)
    // clean-bucket files must survive the sweep untouched: snapshot
    // every (bucket, file, mtime) before
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/chunks"))
      .filter(_.getPath.getName.startsWith("bucket=")).flatMap(d =>
        fs.listStatus(d.getPath).filter(_.getPath.getName.startsWith("part-"))
          .map(f => (d.getPath.getName, f.getPath.getName, f.getModificationTime)))
      .toSet
    val before = bucketFiles()

    val (pruned, nDead, reclaimed) = store.pruneChunks(keep = Seq(2L, 3L))
    assert(pruned == Seq(1L))
    assert(reclaimed == acct(1L), s"reclaimed $reclaimed vs exclusive ${acct(1L)}")
    assert(nDead > 0)
    // dead refs are physically gone, byte-for-byte accounted
    assert(store.refs().count() == refsBefore - nDead)
    assert(store.refs().agg(sum("bytes")).head().getLong(0) == bytesBefore - reclaimed)
    assert(store.versions() == Seq(2L, 3L))
    assert(canon(store.restore(2L)) == canon(v2))
    assert(canon(store.restore(3L)) == canon(v3))
    // the sweep only rewrote dirty buckets: every clean bucket's files
    // are bit-identical (same name + mtime)
    val after = bucketFiles()
    assert(before.intersect(after).nonEmpty,
      "expected at least one clean bucket to carry its files through the sweep")
    // idempotent: a second identical prune finds nothing dead
    val (p2, d2, r2) = store.pruneChunks(keep = Seq(2L, 3L))
    assert(p2.isEmpty && d2 == 0L && r2 == 0L)
  }

  test("backupDelta: O(delta) crypto, carried manifest rows, restores equal a full re-backup") {
    val base = Files.createTempDirectory("graft_chunkstore_delta").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 8)
    val v1 = payloadRows(false, false, false)
    store.backup(v1, "id", "payload", 1L)
    val refsV1 = store.refs().count()
    // delta: id 1 changes, id 2 deleted — id 3 must carry untouched
    val changed = payloadRows(true, false, false).filter($"id" === 1L)
    val (added, addedBytes) = store.backupDelta(1L, 2L, changed,
      Seq(Tuple1(2L)).toDF("id"), "id", "payload")
    // only the changed payload's NEW chunks landed (the repository
    // already held everything else)
    assert(added > 0 && addedBytes > 0)
    assert(store.refs().count() == refsV1 + added)
    val expected = payloadRows(true, true, false)
    assert(canon(store.restore(2L)) == canon(expected))
    assert(canon(store.restore(1L)) == canon(v1)) // v1 untouched
    // manifest carried id 3's rows verbatim from v1
    val m1 = store.manifest(1L).filter($"id" === 3L).collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val m2 = store.manifest(2L).filter($"id" === 3L).collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("sweep collects orphan chunks from a crashed backup (chunks landed, manifest never published)") {
    val base = Files.createTempDirectory("graft_chunkstore_orphan").toString
    val store = new ChunkStore(spark, base, master, nBuckets = 8)
    store.backup(payloadRows(false, false, false), "id", "payload", 1L)
    val refsCommitted = store.refs().count()
    // simulate the crash window: a second backup's chunks appended,
    // then its manifest dir removed before "publish"
    store.backup(payloadRows(true, true, true), "id", "payload", 2L)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/manifests/v=2"), true)
    assert(store.refs().count() > refsCommitted) // orphans present
    val (pruned, nDead, _) = store.pruneChunks(keep = Seq(1L))
    assert(pruned.isEmpty && nDead > 0)
    assert(store.refs().count() == refsCommitted)
    assert(canon(store.restore(1L)) == canon(payloadRows(false, false, false)))
  }
}
