package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** JVM-wide cache of PARSED per-version manifests (guide §6: metadata
  * costs — the snap block pays a `spark.read.parquet` + collect of the
  * same few-hundred-row manifest once per consumer per run, each a
  * full driver round-trip of file listing, footer reads and a
  * one-task job; at 79 snap entries × several manifest reads each
  * that is the broadest per-entry constant in the suite).
  *
  * INVALIDATION CONTRACT — self-validating, no cooperation from the
  * maintenance verbs required: every access re-lists the manifest
  * directory (one metadata call, orders of magnitude cheaper than the
  * read it replaces) and compares a fingerprint of the visible data
  * files (name, length, mtime). Any retention / vacuum / replicate /
  * swap that deletes or replaces the directory changes the listing —
  * freshly written manifests carry per-write unique part-file names —
  * so a cached entry can never serve a pruned or swapped version:
  * mismatch ⇒ reload, missing dir ⇒ the caller's own existence check
  * fails exactly as it did uncached (spec: ManifestCacheSpec).
  *
  * The cached value is the COLLECTED manifest (schema + rows), served
  * as a local relation: joins against it broadcast naturally and
  * collect() needs no file I/O. Manifests are metadata-sized by
  * design (file entries, not data), and the cache is LRU-capped. */
object ManifestCache {
  private case class Entry(fingerprint: String, schema: StructType, rows: Array[Row])

  private val MaxEntries = 512
  private val cache =
    new java.util.LinkedHashMap[(String, Long), Entry](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), Entry]): Boolean =
        size() > MaxEntries
    }

  /** Listing fingerprint over exactly the files `spark.read.parquet(dir)`
    * would serve (non-hidden direct children). None when the layout is
    * unexpected (a non-hidden subdirectory) — the caller then bypasses
    * the cache entirely rather than guess. */
  private def fingerprintOf(fs: FileSystem, dir: Path): Option[String] = {
    val visible = fs.listStatus(dir).filterNot { s =>
      val n = s.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    if (visible.exists(_.isDirectory)) None
    else Some(visible.map(s =>
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|"))
  }

  /** The manifest of (`base`, `version`) as a DataFrame — cached when
    * the directory fingerprint matches, re-read otherwise. Errors
    * (missing dir, unreadable parquet) propagate exactly as uncached. */
  def read(spark: SparkSession, fs: FileSystem, base: String, version: Long,
      dir: Path): DataFrame =
    fingerprintOf(fs, dir) match {
      case None => spark.read.parquet(dir.toString)
      case Some(fp) =>
        val key = (base, version)
        val hit = synchronized(Option(cache.get(key))).filter(_.fingerprint == fp)
        val entry = hit.getOrElse {
          val df = spark.read.parquet(dir.toString)
          val e = Entry(fp, df.schema, df.collect())
          synchronized { cache.put(key, e): Unit }
          e
        }
        spark.createDataFrame(
          java.util.Arrays.asList(entry.rows: _*), entry.schema)
    }

  /** Drop every cached version of a store — not needed for correctness
    * (reads self-validate) but keeps memory honest on teardown. */
  def invalidate(base: String): Unit = synchronized {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == base) it.remove()
  }

  private[operators] def cachedVersions(base: String): Seq[Long] = synchronized {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.toSeq.collect { case (`base`, v) => v }
  }
}
