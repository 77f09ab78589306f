package graft.operators

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Convergent chunk encryption — the scheme encrypted DEDUPLICATING
  * backup stores use (Farsite / Tahoe-LAFS lineage): the per-chunk key
  * derives from the chunk's own content (HMAC(master, SHA-256(chunk)))
  * and the GCM nonce from the content hash, so
  *
  *  - identical plaintext chunks encrypt to IDENTICAL ciphertext →
  *    chunk-level dedup ([[Multimodal.cdcChunks]] + snap_chunk_dedup)
  *    keeps working on the encrypted store;
  *  - nonce reuse is safe by construction: the same (key, nonce) pair
  *    only ever encrypts the same plaintext;
  *  - without the master secret, contents are opaque; the known
  *    convergent trade-off (an attacker who GUESSES an exact chunk can
  *    confirm it) is priced in by the master-key HMAC, which scopes
  *    confirmation to holders of the master.
  *
  * The content hash is the chunk's REFERENCE (stored in the manifest,
  * exactly where chunk_md5 lives today); decryption re-derives the key
  * from master + ref. All JDK crypto (AES-256-GCM, HmacSHA256). */
object ChunkCrypto {

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  /** Encrypt one chunk: returns (ref, blob) where ref = SHA-256 of the
    * plaintext (the store key) and blob = AES-256-GCM ciphertext+tag.
    */
  def encryptChunk(master: Array[Byte], chunk: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val ref = sha256(chunk)
    val key = hmac(master, ref)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, ref, 0, 12))
    (ref, cipher.doFinal(chunk))
  }

  /** Decrypt a chunk blob given its reference (authenticates via the
    * GCM tag; a wrong master or tampered blob throws). */
  def decryptChunk(master: Array[Byte], ref: Array[Byte], blob: Array[Byte]): Array[Byte] = {
    val key = hmac(master, ref)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, ref, 0, 12))
    cipher.doFinal(blob)
  }

  /** Restore payloads from an [[encryptedChunks]] frame: per id, the
    * chunks decrypt, order by index, and concatenate — one shuffle on
    * the id key; per-group state is one payload's bytes, the same
    * footprint any row-level operator carries. The full encrypted
    * backup loop (chunk → encrypt → store → restore) is spec-proven
    * byte-identical. */
  def reassemble(chunks: DataFrame, idCol: String, master: Array[Byte]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.select(col(idCol).cast(LongType), col("chunk_idx"), col("ref_hex"), col("blob"))
      .as[(Long, Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val parts = it.toArray.sortBy(_._2)
        val bytes = parts.flatMap { case (_, _, refHex, blob) =>
          val ref = refHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
          decryptChunk(master, ref, blob)
        }
        (id, bytes)
      }
      .toDF(idCol, "payload")
  }

  /** Dedup-aware storage accounting across chunk-store versions — the
    * report every deduplicating backup tool exposes (what did each
    * backup ADD, what does it SHARE, what would dropping it RECLAIM).
    * Works on any chunk frame with a content-address column (`refCol`:
    * ref_hex, chunk_md5, …) and a byte-size expression (`bytesCol`:
    * `length(col("blob"))`, `col("chunk_bytes")`, …), so it composes
    * with [[encryptedChunks]], [[Multimodal.cdcChunks]], and
    * SnapshotStore versions alike. Per version:
    *
    *  - n_chunks / logical_bytes: all chunk occurrences (restore size)
    *  - n_refs / physical_bytes: distinct content addresses (what the
    *    store must actually hold for this version)
    *  - n_new_refs / new_bytes: addresses no EARLIER version has —
    *    this backup's incremental storage cost
    *  - exclusive_bytes: addresses in NO OTHER version — reclaimed if
    *    this version is pruned (the GC planning number)
    *
    * Scale shape: one shuffle on the content hash (uniform by
    * construction — hashes don't skew), map-side-combinable aggregates
    * on both sides, and the perRef ⋈ refStats join reuses the same
    * hash partitioning. Nothing touches blob payloads except the
    * bytes expression in the first projection. */
  def chunkAccounting(byVersion: Seq[(Long, DataFrame)], refCol: String,
      bytesCol: org.apache.spark.sql.Column): DataFrame = {
    require(byVersion.nonEmpty, "chunkAccounting needs at least one version")
    val rows = byVersion.map { case (v, df) =>
      df.select(lit(v).as("version"), col(refCol).as("ref"),
        bytesCol.cast(LongType).as("bytes"))
    }.reduce(_.unionByName(_))
    val perRef = rows.groupBy("version", "ref")
      .agg(count(lit(1)).as("n_occ"), max(col("bytes")).as("bytes"))
    val refStats = perRef.groupBy("ref")
      .agg(min("version").as("first_version"), count(lit(1)).as("n_versions"))
    perRef.join(refStats, "ref")
      .groupBy("version")
      .agg(
        sum("n_occ").as("n_chunks"),
        sum(col("n_occ") * col("bytes")).as("logical_bytes"),
        count(lit(1)).as("n_refs"),
        sum("bytes").as("physical_bytes"),
        sum(when(col("first_version") === col("version"), 1L).otherwise(0L)).as("n_new_refs"),
        sum(when(col("first_version") === col("version"), col("bytes"))
          .otherwise(0L)).as("new_bytes"),
        sum(when(col("n_versions") === 1, col("bytes")).otherwise(0L)).as("exclusive_bytes"))
  }

  /** Delta-restore planning: given the content addresses a restore
    * TARGET already holds (`have` — a prior restore, a local cache, a
    * replica) and the chunk frame of the version being restored
    * (`want`), report what must actually move: chunks/bytes to fetch
    * vs. chunks/bytes reused — the number a backup tool prints before
    * a restore and the transfer-cost planner for replication at 100 TB
    * (restoring yesterday's state onto today's replica moves only the
    * delta, never the corpus). Counting is per distinct address (the
    * store fetches each chunk once no matter how many payloads share
    * it). One distinct + left-anti-shaped join on the uniform content
    * hash; blobs are never touched. */
  def restorePlan(have: DataFrame, want: DataFrame, refCol: String,
      bytesCol: org.apache.spark.sql.Column): DataFrame = {
    val haveRefs = have.select(col(refCol).as("ref")).distinct()
      .withColumn("__have", lit(1L))
    want.select(col(refCol).as("ref"), bytesCol.cast(LongType).as("bytes"))
      .groupBy("ref").agg(max(col("bytes")).as("bytes"))
      .join(haveRefs, Seq("ref"), "left")
      .agg(
        count(lit(1)).as("n_refs"),
        sum(col("bytes")).as("restore_bytes"),
        sum(when(col("__have").isNull, 1L).otherwise(0L)).as("n_fetch"),
        sum(when(col("__have").isNull, col("bytes")).otherwise(0L)).as("fetch_bytes"),
        sum(when(col("__have").isNotNull, 1L).otherwise(0L)).as("n_reused"),
        sum(when(col("__have").isNotNull, col("bytes")).otherwise(0L)).as("reused_bytes"))
      .withColumn("reuse_ratio",
        round(col("reused_bytes").cast(org.apache.spark.sql.types.DoubleType)
          / col("restore_bytes"), 4))
  }

  /** CDC-chunk + encrypt a payload column: one narrow pass emitting
    * (id, chunk_idx, ref_hex, blob) rows — the encrypted chunk-store
    * ingest. Dedup/GC run on `ref_hex` without ever decrypting. */
  def encryptedChunks(df: DataFrame, idCol: String, payloadCol: String,
      master: Array[Byte], mask: Long = 0x3F, minChunk: Int = 16,
      maxChunk: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Multimodal.cdcBoundaries(bytes, mask, minChunk, maxChunk)
          .iterator.zipWithIndex.map { case ((off, len), idx) =>
            val (ref, blob) = encryptChunk(master,
              java.util.Arrays.copyOfRange(bytes, off, off + len))
            (id, idx.toLong, ref.map("%02x".format(_)).mkString, blob)
          }
      }
      .toDF(idCol, "chunk_idx", "ref_hex", "blob")
  }
}
