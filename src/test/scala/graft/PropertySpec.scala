package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.graft.{MinHashSig, RollingHash}

/** Property checks (SURVEY §6) over the pure JVM kernels the engine's
  * hashing/fingerprinting rests on — no SparkSession needed, so each
  * property runs hundreds of generated cases in milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val text: Gen[String] =
    Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val bytes: Gen[Array[Byte]] =
    Gen.choose(0, 2048).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  test("xorPad: commutative, associative, self-inverse — the algebra parity repair rests on") {
    import graft.operators.ChunkStore.{md5hex, xorPad}
    check(Prop.forAll(bytes, bytes) { (a, b) =>
      md5hex(xorPad(a, b)) == md5hex(xorPad(b, a))
    })
    check(Prop.forAll(bytes, bytes, bytes) { (a, b, c) =>
      md5hex(xorPad(xorPad(a, b), c)) == md5hex(xorPad(a, xorPad(b, c)))
    })
    // parity ⊕ (all files but one) recovers the one — on arbitrary
    // unequal-length triples (padding must not corrupt recovery)
    check(Prop.forAll(bytes, bytes, bytes) { (a, b, c) =>
      val parity = xorPad(xorPad(a, b), c)
      val rebuilt = java.util.Arrays.copyOf(xorPad(parity, xorPad(b, c)), a.length)
      java.util.Arrays.equals(rebuilt, a)
    })
  }

  test("shingleSeq: distinct k-grams of exactly k tokens, whitespace/case invariant") {
    check(Prop.forAll(text, Gen.choose(1, 4)) { (t, k) =>
      val sh = Dedup.shingleSeq(t, k)
      val messy = "  " + t.replace(" ", "   ").toUpperCase(java.util.Locale.ROOT) + " "
      sh.distinct == sh &&
        sh.forall(_.split(" ").length == k) &&
        Dedup.shingleSeq(messy, k) == sh
    })
  }

  test("minhash signature: normalization invariant, fixed length, null iff too short") {
    check(Prop.forAll(text, Gen.choose(1, 3)) { (t, k) =>
      val sig = MinHashSig.signature(t, k, 16)
      val messy = " " + t.replace(" ", "  ") + "  "
      // the kernel's token count: an empty text is ONE empty token
      // (split never returns an empty array), mirroring docShingles
      val tooShort = t.trim.replaceAll("\\s+", " ").split(" ").length < k
      if (tooShort) sig == null
      else sig.length == 16 &&
        java.util.Arrays.equals(MinHashSig.signature(messy, k, 16), sig)
    })
  }

  test("rolling hash: prefix recurrence holds and value stays in [0, mod)") {
    check(Prop.forAll(text, Gen.alphaLowerChar) { (t, c) =>
      val h = RollingHash.compute(t)
      h >= 0 && h < RollingHash.Mod &&
        RollingHash.compute(t + c) == (h * RollingHash.Mult + c.toInt) % RollingHash.Mod
    })
  }

  test("cdc boundaries tile the payload with bounded chunks, deterministically") {
    check(Prop.forAll(bytes) { b =>
      val bounds = Multimodal.cdcBoundaries(b, 0x3F, 8, 256)
      val tiles = bounds.foldLeft((true, 0)) { case ((ok, pos), (off, len)) =>
        (ok && off == pos && len > 0 && len <= 256, pos + len)
      }
      tiles._1 && tiles._2 == b.length &&
        Multimodal.cdcBoundaries(b.clone(), 0x3F, 8, 256) == bounds
    })
  }

  test("blockHash: deterministic and length-stable under cloning") {
    check(Prop.forAll(bytes) { b =>
      Multimodal.blockHash(b) == Multimodal.blockHash(b.clone())
    })
  }

  private val master: Gen[Array[Byte]] =
    Gen.listOfN(32, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("convergent chunk crypto: round-trip, convergence, address stability, key separation") {
    import graft.operators.ChunkCrypto
    check(Prop.forAll(bytes, master, master) { (b, m1, m2) =>
      val (ref1, blob1) = ChunkCrypto.encryptChunk(m1, b)
      val (ref1b, blob1b) = ChunkCrypto.encryptChunk(m1, b)
      val (ref2, blob2) = ChunkCrypto.encryptChunk(m2, b)
      val roundTrip = ChunkCrypto.decryptChunk(m1, ref1, blob1).sameElements(b)
      // convergence: same (master, plaintext) → identical ciphertext —
      // the property repository dedup rests on
      val convergent = ref1.sameElements(ref1b) && blob1.sameElements(blob1b)
      // the address is the PLAINTEXT's hash: master-independent (what
      // makes rekeyTo's manifests carry verbatim)
      val addressStable = ref1.sameElements(ref2)
      // key separation: a different master cannot decrypt (GCM tag),
      // and produces different ciphertext for non-trivial plaintexts
      val separated = java.util.Arrays.equals(m1, m2) || {
        val cannotDecrypt =
          try { ChunkCrypto.decryptChunk(m2, ref1, blob1); false }
          catch { case _: Exception => true }
        cannotDecrypt && (b.isEmpty || !blob1.sameElements(blob2))
      }
      roundTrip && convergent && addressStable && separated
    })
  }
}
