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
