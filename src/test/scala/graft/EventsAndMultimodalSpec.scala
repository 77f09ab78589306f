package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Events, Multimodal}

class EventsAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("videoNearDup pairs a trimmed copy on shared full frames, ignores partial tails") {
    // pseudo-random bytes — a monotonic ramp would be pathological for
    // aHash (every ramp frame shares one low-half/high-half bit
    // pattern and the distinct collapses them)
    val rA = new scala.util.Random(11)
    val rC = new scala.util.Random(23)
    val a = Array.fill(200)(rA.nextInt(256).toByte)
    val b = a ++ Array.fill(40)(rA.nextInt(256).toByte) // A + appended tail
    val c = Array.fill(200)(rC.nextInt(256).toByte)     // unrelated
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vid_id", "payload")
    val pairs = Multimodal.videoNearDup(df, "vid_id", "payload",
        frameBytes = 16, stride = 4, minSharedFrames = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_shared")))
    // A has kept full frames at indices 0, 4, 8 — all inside B's
    // prefix; the partial 8-byte tail frame must not count
    assert(pairs.toSeq == Seq((1L, 2L, 3L)))
  }

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("sessionize splits on gaps > threshold") {
    val df = Seq(
      (1L, ts(0), 10L), (2L, ts(10), 10L),   // session 1
      (3L, ts(60), 10L),                     // session 2 (50 min gap)
      (4L, ts(5), 20L)                       // other user
    ).toDF("event_id", "ts", "user_id")
    val out = Events.sessionize(df, 1800L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 2L)
    assert(out(4L) == 1L)
  }

  test("transitions counts per-user consecutive type pairs with row-normalized shares") {
    val df = Seq(
      (1L, ts(0), 10L, "click"), (2L, ts(1), 10L, "view"), (3L, ts(2), 10L, "click"),
      (4L, ts(0), 20L, "click"), (5L, ts(1), 20L, "view")
      // user boundaries never pair: 3 (u10) and 4 (u20) don't transition
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("click", "view")) == ((2L, 1.0)))   // both click→view
    assert(out(("view", "click")) == ((1L, 1.0)))
    assert(out.size == 2)
  }

  test("packSequences: doc joins the sequence its first token lands in") {
    import graft.operators.Pipeline
    // lang en, 512-budget: docs of 300+300 tokens — second doc STARTS
    // at cum 300 (< 512) so both pack into seq 0; third starts at 600
    val df = Seq(
      (1L, "en", 300L), (2L, "en", 300L), (3L, "en", 300L),
      (4L, "de", 600L), (5L, "de", 100L)
    ).toDF("doc_id", "lang", "n_tokens")
    val out = Pipeline.packSequences(df, "lang", 512L).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("seq_id")).toMap
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 1L)
    assert(out(4L) == 0L && out(5L) == 1L) // de doc 5 starts at 600 → seq 1
  }

  test("blockHash: brightness-shift invariant, local edits stay local") {
    // structured "image": a smooth ramp — block means far from the
    // global mean except at the center (real images have structure;
    // uniform noise is the adversarial case where every block is
    // borderline)
    val n = 6400
    val img = Array.tabulate[Byte](n)(i => (28 + i * 200 / n).toByte)
    val h1 = Multimodal.blockHash(img)
    assert(Multimodal.blockHash(img.clone()) == h1)
    // uniform brightness shift: every mean moves WITH the global mean
    // → identical hash (the aHash property)
    val brighter = img.map(b => (b + 20).toByte)
    assert(Multimodal.blockHash(brighter) == h1)
    // zeroing blocks 50..55 flips (at most) those high bits plus
    // center-borderline wobble from the lowered global mean; the low
    // third of the image is far below threshold and must not move
    val edited = img.clone()
    (5000 until 5600).foreach(i => edited(i) = 0)
    val h2 = Multimodal.blockHash(edited)
    val d = java.lang.Long.bitCount(h1 ^ h2)
    assert(d >= 1 && d <= 16, s"expected a localized hamming move, got $d")
    assert(((h1 ^ h2) & ((1L << 20) - 1)) == 0L, "low blocks must be stable")
    // an inverse ramp is far away
    val other = Array.tabulate[Byte](n)(i => (228 - i * 200 / n).toByte)
    assert(java.lang.Long.bitCount(h1 ^ Multimodal.blockHash(other)) > 20)
  }

  test("cdc chunking: reassembly, determinism, and edit resynchronization") {
    val rnd = new scala.util.Random(42)
    val base = Array.fill[Byte](4000)(rnd.nextInt(256).toByte)
    val bounds = Multimodal.cdcBoundaries(base, 0x3F, 16, 1024)
    // chunks tile the payload exactly
    assert(bounds.head._1 == 0)
    assert(bounds.map(_._2).sum == base.length)
    bounds.sliding(2).foreach {
      case Seq((o1, l1), (o2, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(bounds.forall { case (_, l) => l <= 1024 })
    // determinism
    assert(Multimodal.cdcBoundaries(base, 0x3F, 16, 1024) == bounds)
    // an insertion near the front shifts offsets but the stream
    // re-synchronizes: most of the original chunk HASHES survive,
    // which fixed-size blocks would all lose
    def md5s(b: Array[Byte]) = Multimodal.cdcBoundaries(b, 0x3F, 16, 1024).map {
      case (o, l) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(b, o, l); md.digest().toSeq
    }.toSet
    val edited = Array.fill[Byte](40)(rnd.nextInt(256).toByte) ++ base
    val shared = md5s(base) intersect md5s(edited)
    assert(shared.size >= md5s(base).size * 2 / 3,
      s"only ${shared.size} of ${md5s(base).size} chunks survived the edit")
    def fixedBlocks(b: Array[Byte]) = b.grouped(64).map(_.toSeq).toSet
    assert((fixedBlocks(base) intersect fixedBlocks(edited)).size <= 2)
  }

  test("decodeImageMeta decodes real PNG/JPEG headers; non-images carry null metadata") {
    val df = Seq(
      (20L, Multimodal.syntheticImage(20L, "png")),
      (21L, Multimodal.syntheticImage(21L, "jpg")),
      (2L, "definitely not an image".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodeImageMeta(df, "id", "payload")
    assert(out.columns.toSet == Set("id", "payload", "width", "height", "channels", "format"))
    val meta = out.select("id", "width", "height", "channels", "format").collect()
      .map(r => r.getLong(0) -> r).toMap
    // dimensions are closed-form in the id: w = 8 + id%16, h = 8 + (id/16)%16
    assert(meta(20L).getInt(1) == 12 && meta(20L).getInt(2) == 9)
    assert(meta(20L).getString(4) == "png" && meta(20L).getInt(3) == 3)
    assert(meta(21L).getInt(1) == 13 && meta(21L).getString(4) == "jpeg")
    assert(meta(2L).isNullAt(1) && meta(2L).isNullAt(4),
      "unrecognized bytes must yield null metadata, not an error")
    // one-pass contract: attaching metadata shuffles NOTHING — a plan
    // with an Exchange would move the binary payload bytes
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("decodeLuma: corrupt/truncated payloads yield None, not a task-killing exception") {
    val ok = Multimodal.syntheticImage(5L, "png")
    assert(Multimodal.decodeLuma(ok).isDefined)
    // a recognized-but-truncated PNG makes ImageIO.read THROW — the
    // decode contract is None, same as decodeImage
    assert(Multimodal.decodeLuma(ok.take(ok.length / 2)).isEmpty)
    assert(Multimodal.decodeLuma(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.pixelHash(ok.take(ok.length / 2)).isEmpty)
  }

  test("PNG round-trips pixels exactly; pixel aHash survives JPEG, separates rasters, ignores brightness") {
    val id = 37L
    val Some((w, h, luma)) = Multimodal.decodeLuma(Multimodal.syntheticImage(id, "png"))
    val img = Multimodal.syntheticRaster(id)
    assert(w == img.getWidth && h == img.getHeight)
    val rgb0 = img.getRGB(3, 2)
    val want = (299 * ((rgb0 >> 16) & 0xff) + 587 * ((rgb0 >> 8) & 0xff) +
      114 * (rgb0 & 0xff)) / 1000
    assert(luma(2 * w + 3) == want, "lossless decode must match the raster formula")
    // aHash: JPEG noise stays within a small Hamming ball …
    val hp = Multimodal.pixelHash(Multimodal.syntheticImage(id, "png")).get
    val hj = Multimodal.pixelHash(Multimodal.syntheticImage(id, "jpg")).get
    assert(java.lang.Long.bitCount(hp ^ hj) <= 8)
    // … a structurally different raster separates …
    val ho = Multimodal.pixelHash(Multimodal.syntheticImage(id + 1, "png")).get
    assert(java.lang.Long.bitCount(hp ^ ho) > 8)
    // … and a uniform brightness shift changes NOTHING (cell means and
    // the global mean move together)
    val bright = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        def lift(v: Int) = math.min(255, v + 10)
        b.setRGB(x, y, (lift((p >> 16) & 0xff) << 16) |
          (lift((p >> 8) & 0xff) << 8) | lift(p & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos); bos.toByteArray
    }
    assert(java.lang.Long.bitCount(
      hp ^ Multimodal.pixelHash(bright).get) <= 2)
  }

  test("dctHash: flat image hashes to 0, offsets are absorbed exactly, rasters separate") {
    def flat(v: Int, w: Int, h: Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos); bos.toByteArray
    }
    // constant plane: every AC coefficient is exactly 0 = the median,
    // the strict > never fires — pHash 0 whatever the brightness
    assert(Multimodal.dctHash(flat(0, 9, 13)).contains(0L))
    assert(Multimodal.dctHash(flat(200, 16, 8)).contains(0L))
    // a uniform +20 luma offset lands ENTIRELY in the DC coefficient
    // (every u≥1 basis row sums to zero), so the AC block — and the
    // hash — is bit-identical, not merely close
    val id = 37L
    val img = Multimodal.syntheticRaster(id)
    val (w, h) = (img.getWidth, img.getHeight)
    val shifted = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        def lift(v: Int) = math.min(235, v) + 20
        b.setRGB(x, y, (lift((p >> 16) & 0xff) << 16) |
          (lift((p >> 8) & 0xff) << 8) | lift(p & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos); bos.toByteArray
    }
    val clipped = {
      // clip the ORIGINAL the same way so both inputs share a base
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        def clip(v: Int) = math.min(235, v)
        b.setRGB(x, y, (clip((p >> 16) & 0xff) << 16) |
          (clip((p >> 8) & 0xff) << 8) | clip(p & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos); bos.toByteArray
    }
    assert(Multimodal.dctHash(clipped).get == Multimodal.dctHash(shifted).get)
    // structurally different rasters separate
    val d = java.lang.Long.bitCount(
      Multimodal.dctHash(Multimodal.syntheticImage(id, "png")).get ^
        Multimodal.dctHash(Multimodal.syntheticImage(id + 1, "png")).get)
    assert(d > 8, s"cross-raster pHash distance $d")
    // undecodable payloads fail soft like the rest of the decode stack
    assert(Multimodal.dctHash(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("sampleFrames fans out strided fixed-size windows") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq((7L, payload)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", frameBytes = 10, stride = 2).collect()
    assert(frames.length == 5) // 10 windows, every 2nd
    assert(frames.forall(_.getAs[Long]("id") == 7L))
    assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq == Seq(0L, 2L, 4L, 6L, 8L))
  }

  test("userPaths joins each user's first-N types in event order, counts, tiebreaks") {
    val df = Seq(
      // user 10: 4 events in ts order (one ts tie broken by event_id)
      (1L, ts(0), 10L, "view"), (2L, ts(1), 10L, "click"),
      (3L, ts(1), 10L, "buy"),  // same ts as event 2 → event_id orders it after
      (4L, ts(9), 10L, "view"),
      // user 20: same opening 3 steps
      (5L, ts(0), 20L, "view"), (6L, ts(2), 20L, "click"), (7L, ts(3), 20L, "buy"),
      // user 30: different path, only 2 events (shorter than N)
      (8L, ts(0), 30L, "click"), (9L, ts(1), 30L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.userPaths(df, 3, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // counts order first, then path lexicographic
    assert(out.toSeq == Seq("view>click>buy" -> 2L, "click>view" -> 1L))
    // top-k boundary stays deterministic: k=1 keeps the count-2 path
    val top1 = Events.userPaths(df, 3, 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "view>click>buy")
  }

  test("rfm: bounded-frame quintile scores, ties share a score") {
    val day = 1440 // minutes
    val df = Seq(
      // u1: days 0+9, mon 10 → mb 1 | u2: day 9, mon 100 → mb 10
      // u3: day 0 only (recency 9), 3 events, mon 3 → mb 0
      (1L, ts(0), 1L, 5.0), (2L, ts(9 * day), 1L, 5.0),
      (3L, ts(9 * day), 2L, 100.0),
      (4L, ts(0), 3L, 1.0), (5L, ts(1), 3L, 1.0), (6L, ts(2), 3L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Events.rfm(df).collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // n=3. recency: {0: 2 users, 9: 1} worse-first desc → 9 scores 1,
    // 0 scores floor(5*1/3)+1 = 2 (the two recency-0 users TIE)
    // frequency asc {1,2,3} → scores 1, 2, floor(10/3)+1 = 4
    // monetary buckets asc {0,1,10} → scores 1, 2, 4
    assert(out(1L) == ((0L, 2L, 10.0, 2L, 2L, 2L, 222L)))
    assert(out(2L) == ((0L, 1L, 100.0, 2L, 1L, 4L, 214L)))
    assert(out(3L) == ((9L, 3L, 3.0, 1L, 4L, 1L, 141L)))
  }

  test("WAV decode: header metadata, exact PCM round-trip, fail-soft on garbage") {
    val id = 7L
    val wav = Multimodal.syntheticWav(id)
    val Some(m) = Multimodal.decodeAudioMeta(wav)
    assert(m.sampleRate == Multimodal.audioRateOf(id))
    assert(m.channels == Multimodal.audioChannelsOf(id))
    assert(m.bitsPerSample == 16)
    assert(m.frames == Multimodal.audioFramesOf(id).toLong)
    // WAV is lossless: decoded samples must equal the waveform formula
    val Some(dec) = Multimodal.decodeAudioSamples(wav)
    val pcm = Multimodal.syntheticPcm(id)
    assert(dec.length == pcm.length)
    assert(dec.indices.forall(i => dec(i) == pcm(i).toInt))
    // unrecognized / truncated payloads: None, never an exception
    assert(Multimodal.decodeAudioMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeAudioMeta(wav.take(10)).isEmpty)
    assert(Multimodal.decodeAudioSamples(Array[Byte](82, 73, 70)).isEmpty)
    assert(Multimodal.audioFingerprint(Array[Byte](9, 9)).isEmpty)
  }

  test("syntheticWav: direct RIFF framing is byte-identical to the JDK encoder") {
    // the direct framer replaced javax.sound (provider registry
    // serializes concurrent callers); the bytes must not move — the
    // oracle recomputes header fields and downstream queries hash
    // payload-derived values. Sweep the whole parameter space the id
    // drives: rate (id%4), channels (id%2), frames (id%40), both gains.
    def jdkWav(id: Long, gain: Int): Array[Byte] = {
      val pcm = Multimodal.syntheticPcm(id, gain)
      val ch = Multimodal.audioChannelsOf(id)
      val fmt = new javax.sound.sampled.AudioFormat(
        Multimodal.audioRateOf(id).toFloat, 16, ch, true, false)
      val bytes = new Array[Byte](pcm.length * 2)
      var i = 0
      while (i < pcm.length) {
        bytes(2 * i) = (pcm(i) & 0xff).toByte
        bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, (pcm.length / ch).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      try javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
      finally ais.close()
      bos.toByteArray
    }
    (0L until 80L).foreach { id =>
      Seq(1, 2).foreach { gain =>
        assert(Multimodal.syntheticWav(id, gain).sameElements(jdkWav(id, gain)),
          s"direct WAV bytes diverge from the JDK encoder at id=$id gain=$gain")
      }
    }
    // and the direct decoder round-trips what the JDK encoder wrote
    val viaJdk = jdkWav(13L, 1)
    assert(Multimodal.decodeAudioMeta(viaJdk).exists(_.frames ==
      Multimodal.audioFramesOf(13L).toLong))
    assert(Multimodal.decodeAudioSamples(viaJdk).exists(
      _.sameElements(Multimodal.syntheticPcm(13L).map(_.toInt))))
  }

  test("audioFingerprint: volume-invariant, separating, None below 64 samples") {
    // a gain scales every span mean and the global mean together, so
    // no bit of the 64-span hash moves — exercised across waveform
    // shapes (rate/channels/frames all vary with id)
    (0L until 50L).foreach { id =>
      val f1 = Multimodal.audioFingerprint(Multimodal.syntheticWav(id)).get
      val f2 = Multimodal.audioFingerprint(Multimodal.syntheticWav(id, gain = 2)).get
      assert(f1 == f2, s"gain changed the fingerprint for id=$id")
    }
    // structurally different waveforms separate on average (mean
    // Hamming distance, not max — single-pair distances are noisy)
    val dists = (0L until 50L).map { id =>
      val a = Multimodal.audioFingerprint(Multimodal.syntheticWav(id)).get
      val b = Multimodal.audioFingerprint(Multimodal.syntheticWav(id + 50)).get
      java.lang.Long.bitCount(a ^ b)
    }
    assert(dists.sum.toDouble / dists.size > 10.0)
    // sub-64-sample payloads have no meaningful 64-span hash
    val tiny = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](20)), fmt, 10L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.audioFingerprint(tiny).isEmpty)
  }

  test("mediaFor: persisted media.parquet is byte-identical to the synthesized path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_").toString
    Seq(1L, 2L, 7L, 40L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    def snap() = Multimodal.mediaFor(spark, dir).collect().map { r =>
      r.getAs[Long]("doc_id") -> Seq("png", "jpg", "wav", "wav2", "avi")
        .map(c => r.getAs[Array[Byte]](c).toSeq)
    }.toMap
    val synthesized = snap() // no media.parquet yet → in-query synthesis
    graft.tools.MediaGen.writeMedia(spark, dir)
    val persisted = snap()   // now scans the persisted binary columns
    assert(persisted.keySet == synthesized.keySet)
    persisted.keySet.foreach(id => assert(persisted(id) == synthesized(id),
      s"payload drift for doc_id=$id — persisted and synthesized must be identical"))
  }

  test("AVI container: round-trip parse recovers headers, every MJPEG frame decodes") {
    for (id <- Seq(0L, 17L, 255L, 1000L)) {
      val (m, frames) = Multimodal.decodeAvi(Multimodal.syntheticAvi(id))
        .getOrElse(fail(s"well-formed AVI for id=$id did not parse"))
      assert(m.width == 8 + (id % 16).toInt && m.height == 8 + ((id / 16) % 16).toInt,
        s"id=$id dims $m")
      assert(m.nFrames == Multimodal.videoFramesOf(id) && m.fps == Multimodal.videoFpsOf(id)
        && m.handler == "MJPG", s"id=$id header $m")
      assert(frames.length == m.nFrames, s"id=$id movi chunk count")
      val decoded = frames.flatMap(Multimodal.decodeImage(_))
      assert(decoded.length == frames.length
        && decoded.forall(im => im.width == m.width && im.height == m.height
          && im.format == "jpeg"),
        s"id=$id frames did not all decode to the container's declared dims")
    }
  }

  test("AVI parse fail-soft: foreign bytes and truncation classify, never throw") {
    assert(Multimodal.decodeAvi("not a container".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAvi(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAvi(Multimodal.syntheticWav(3L)).isEmpty, // RIFF but WAVE
      "a WAV is RIFF too — the AVI fourcc gate must reject it")
    // truncated mid-movi: headers parsed, tail frames simply absent
    val full = Multimodal.syntheticAvi(7L)
    val cut = java.util.Arrays.copyOf(full, full.length - full.length / 4)
    Multimodal.decodeAvi(cut) match {
      case Some((m, frames)) =>
        assert(m.handler == "MJPG" && frames.length < Multimodal.videoFramesOf(7L))
      case None => // also acceptable: too little survived to classify
    }
  }

  test("attachAudioMeta: one pass, no Exchange, nulls for undecodable payloads") {
    val df = Seq((1L, Multimodal.syntheticWav(1L), "keep"),
      (2L, Array[Byte](1, 2, 3), "also")).toDF("id", "payload", "tag")
    val out = Multimodal.attachAudioMeta(df, "payload")
    // payload bytes must never shuffle: the attach is a narrow map
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Any]("sample_rate"), r.getAs[Any]("frames"), r.getAs[String]("tag")))).toMap
    assert(rows(1L) == ((Multimodal.audioRateOf(1L), Multimodal.audioFramesOf(1L).toLong, "keep")))
    assert(rows(2L) == ((null, null, "also")))
  }
}
