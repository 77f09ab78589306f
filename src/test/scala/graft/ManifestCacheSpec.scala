package graft

import org.apache.hadoop.fs.Path
import graft.operators.{ManifestCache, ManifestStore}

/** The manifest metadata cache's INVALIDATION CONTRACT: a cached read
  * must never serve a pruned or swapped version — the cache
  * re-fingerprints the manifest directory's listing on every access,
  * so no maintenance verb has to cooperate. */
class ManifestCacheSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = {
    val base = java.nio.file.Files.createTempDirectory("graft-mancache").toString
    (new ManifestStore(spark, base, "k"), base)
  }

  private def rows(ks: Range, tag: String) =
    ks.map(k => (k.toLong, s"$tag-$k")).toDF("k", "v")

  test("warm manifest reads are served identical to cold; reads stay correct across commits") {
    val (store, _) = newStore()
    store.write(rows(1 to 100, "a"), 1L, numFiles = 4)
    val cold = store.manifest(1L).collect().map(_.toSeq).toSet
    val warm = store.manifest(1L).collect().map(_.toSeq).toSet // cache hit
    assert(cold == warm && cold.nonEmpty)
    store.mergeDelta(1L, 2L, Seq((3L, "upd")).toDF("k", "v"))
    assert(store.manifest(2L).collect().nonEmpty)
    // v1's cached manifest still serves v1's own content
    assert(store.manifest(1L).collect().map(_.toSeq).toSet == cold)
  }

  test("a pruned version can never be served from cache") {
    val (store, _) = newStore()
    store.write(rows(1 to 50, "a"), 1L)
    store.mergeDelta(1L, 2L, Seq((1L, "u1")).toDF("k", "v"))
    store.manifest(1L).collect() // warm the cache with v1
    store.prune(keep = Seq(2L))  // retention deletes v1's manifest dir
    val e = intercept[IllegalArgumentException](store.manifest(1L))
    assert(e.getMessage.contains("version 1 does not exist"))
  }

  test("a swapped/rewritten manifest dir re-reads — the fingerprint moves with the listing") {
    val (store, base) = newStore()
    store.write(rows(1 to 60, "a"), 1L, numFiles = 2)
    val before = store.manifest(1L).collect().map(_.toSeq).toSet // warm
    // model a replicate-style in-place swap: v1's manifest dir is
    // REPLACED wholesale by a different (here: v2-shaped) manifest
    store.mergeDelta(1L, 2L, Seq((5L, "u5"), (999L, "new")).toDF("k", "v"))
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1dir = new Path(s"$base/_manifests/v=1")
    val v2dir = new Path(s"$base/_manifests/v=2")
    val aside = new Path(s"$base/_manifests/v=1_old")
    assert(fs.rename(v1dir, aside))
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, v2dir, fs, v1dir, false,
      spark.sparkContext.hadoopConfiguration))
    val after = store.manifest(1L).collect().map(_.toSeq).toSet
    assert(after != before, "cache served the pre-swap manifest")
    assert(after == store.manifest(2L).collect().map(_.toSeq).toSet)
    // and swapping BACK also re-reads (mtime/name fingerprint again)
    fs.delete(v1dir, true)
    assert(fs.rename(aside, v1dir))
    assert(store.manifest(1L).collect().map(_.toSeq).toSet == before)
  }

  test("invalidate() drops a store's entries; other stores unaffected") {
    val (s1, b1) = newStore()
    val (s2, b2) = newStore()
    s1.write(rows(1 to 10, "a"), 1L)
    s2.write(rows(1 to 10, "b"), 1L)
    s1.manifest(1L).collect(); s2.manifest(1L).collect()
    ManifestCache.invalidate(b1)
    assert(s1.manifest(1L).collect().nonEmpty) // re-reads fine
    assert(s2.manifest(1L).collect().nonEmpty)
  }
}
