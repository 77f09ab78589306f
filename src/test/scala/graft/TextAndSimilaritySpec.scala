package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}

class TextAndSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("text stats counts tokens and chars") {
    val df = Seq((1L, "hello world foo")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(df).collect().head
    assert(r.getLong(1) == 15L) // n_chars
    assert(r.getLong(2) == 3L)  // n_tokens
  }

  test("anonymize redacts typed placeholders in pinned order") {
    val df = Seq(
      (1L, "mail me at bob@example.com or visit https://x.io/a?e=c@d.com from 10.0.0.1 ref 12345678 done")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.anonymize(df).collect().head
    // URL first: the email inside the URL query never splits it; the
    // count is raw-text hits (2 emails + 1 url + 1 ip + 1 longnum)
    val expected = "mail me at <EMAIL> or visit <URL> from <IP> ref <NUM> done"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("redacted_md5") == md)
    assert(r.getAs[Long]("redacted_len") == expected.length.toLong)
    assert(r.getAs[Long]("n_redacted") == 5L)
  }

  test("deflate_ratio: repetition compresses, prose does not, SQL surface registered") {
    import org.apache.spark.sql.graft.DeflateRatioFunctions.deflateRatio
    val df = Seq(
      (1L, "spam " * 200),
      (2L, (1 to 150).map(i => s"w${i * 7919 % 1000}x${i * 104729 % 997}").mkString(" ")),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < 0.1, s"looping text must compress hard, got ${out(1L)}")
    assert(out(2L) > 0.3, s"high-entropy text must not, got ${out(2L)}")
    assert(out(3L) == 1.0) // empty input: nothing to compress
    assert(out(1L) < out(2L))
    // registered on the SQL surface
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("dr_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, deflate_ratio(text) AS r FROM dr_docs ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == out)
  }

  test("rakeKeywords: hand-worked degree/freq scores, dedup, co-occurrence beats frequency") {
    // stopwords ("the", "and") delimit three candidate runs:
    // [quick brown fox] x2 and [lazy dog]. Word scores (degree/freq):
    // quick=brown=fox = 6/2 = 3, lazy=dog = 2/1 = 2 → phrase scores
    // 9.0 and 4.0; the repeated phrase is ONE candidate with n_occ=2.
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog and quick brown fox")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeywords(df, 3).orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, "quick brown fox", 3L, 2L, 9.0),
      (2L, "lazy dog", 2L, 1L, 4.0)))
  }

  test("pmiCollocations: hand-worked PMI, support filter, rank order") {
    // corpus T = 25 tokens; adjacent pairs with support ≥ 5 are
    // (a,b) = 5 and (b,x) = 5, each over unigrams 5·5 →
    // PMI = ln(5·25/25) = ln 5 = 1.609438; (x,a) = 4 falls to the
    // support filter and doc 2's singleton pairs never qualify
    val df = Seq(
      (1L, "a b x a b x a b x a b x a b x"),
      (2L, "z c z d z e z f z g")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(df, 5, 30).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "b", 5L, 1.609438),
      ("b", "x", 5L, 1.609438)))
  }

  test("bigramPerplexity: fluent repetition scores below garble; invariants hold") {
    // three docs over a shared vocabulary: d1/d2 repeat the corpus's
    // dominant bigram pattern (high C(w1w2)/C(w1) everywhere), d3
    // walks pairs the corpus never repeats — its bigram term falls to
    // the unigram floor, so its perplexity must be strictly higher
    val df = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "the cat sat on the mat the cat sat on the mat"),
      (3L, "mat the on cat the sat mat on sat cat the on")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramPerplexity(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    // n_bigrams = tokens - 1 (12-token docs)
    assert(r.values.forall(_.getLong(1) == 11L))
    // interpolated probabilities are < 1 → nll > 0 → ppl > 1
    assert(r.values.forall(_.getDouble(3) > 1.0))
    // identical docs score identically; garble scores strictly worse
    assert(r(1L).getDouble(3) == r(2L).getDouble(3))
    assert(r(3L).getDouble(3) > r(1L).getDouble(3))
    // ppl = exp(nll) within rounding
    val row = r(1L)
    assert(math.abs(row.getDouble(3) - math.exp(row.getDouble(2))) < 1e-3)
  }

  test("mipsTopK ranks by inner product where cosine order is wrong") {
    // q·(5,5) = 5 beats q·(1,0) = 1, but cosine prefers the parallel
    // small vector — MIPS must pick the big one first
    val emb = Seq(
      (100L, Array(1f, 0f)),      // the query
      (1L, Array(5f, 5f)),
      (2L, Array(1f, 0.01f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 100L)
    val mips = Similarity.mipsTopK(q, emb.filter(col("vec_id") < 100L), 2).collect()
    assert(mips.map(r => (r.getAs[Long]("rk"), r.getAs[Long]("neighbor_id"))).toSet ==
      Set((1L, 1L), (2L, 2L)))
    val cosTop = Similarity.bruteForceTopK(q, emb.filter(col("vec_id") < 100L), 1)
      .collect().head.getAs[Long]("neighbor_id")
    assert(cosTop == 2L) // cosine picks the other one — orders differ
  }

  test("augmented-LSH MIPS equals exact MIPS under full bucket coverage") {
    // planes=1, probes=1 → every query probes both buckets, so the
    // reduction's RANK EQUIVALENCE is isolated from bucket recall
    val rnd = new scala.util.Random(7)
    val emb = (1L to 40L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))).toDF("vec_id", "embedding")
    val q = (101L to 105L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))).toDF("vec_id", "embedding")
    val exact = Similarity.mipsTopK(q, emb, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk")) -> r.getAs[Long]("neighbor_id")).toMap
    val viaLsh = Similarity.mipsLshTopKFor(q, emb, planes = 1, k = 3, probes = 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk")) -> r.getAs[Long]("neighbor_id")).toMap
    assert(viaLsh == exact)
  }

  test("learnBpeMerges: known merge sequence, freq weighting, tie-break, early stop") {
    val df = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val out = TextAnalysis.learnBpeMerges(df, 5).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_count")))
    // (a,a) wins at 6 (two overlapping pairs × freq 3); then the
    // (aa,a)/(a,b) tie at 3 breaks to the binary-ascending (a,b);
    // then (aa,ab); then the single-symbol words stop the loop early
    assert(out.toSeq == Seq(
      (1L, "a", "a", 6L), (2L, "a", "b", 3L), (3L, "aa", "ab", 3L)))
  }

  test("bpeEncode applies ranked merges greedily — hand-worked counts, trainer round-trip") {
    val df = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    // under the trained merges (a,a) (a,b) (aa,ab): aaab → [aa][ab] →
    // after rank-3 → [aaab], a single piece per word
    val full = TextAnalysis.bpeEncode(df, TextAnalysis.learnBpeMerges(df, 5))
      .collect().head
    assert((full.getAs[Long]("n_words"), full.getAs[Long]("n_chars"),
      full.getAs[Long]("n_bpe_pieces")) == ((3L, 12L, 3L)))
    // rank-1 only: aaab → [aa][a][b] = 3 pieces/word (greedy left-to-
    // right: the FIRST aa merges, the remaining a cannot re-pair)
    val r1 = TextAnalysis.bpeEncode(df, TextAnalysis.learnBpeMerges(df, 1))
      .collect().head
    assert(r1.getAs[Long]("n_bpe_pieces") == 9L)
    // empty merge list degenerates to the character count
    val r0 = TextAnalysis.bpeEncode(df,
      TextAnalysis.learnBpeMerges(df, 1).limit(0)).collect().head
    assert(r0.getAs[Long]("n_bpe_pieces") == r0.getAs[Long]("n_chars"))
    // multi-doc: per-doc counts independent, zero-token doc carried
    val multi = Seq((1L, "aaab xy"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(multi, TextAnalysis.learnBpeMerges(df, 5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_pieces"))).toMap
    assert(got(1L) == ((2L, 3L))) // aaab→1 piece, xy→2 pieces (no merge hits)
    assert(got(2L)._1 == 0L && got(2L)._2 == 0L)
  }

  test("rangeSearch returns every neighbor at-or-over the rounded threshold, never self") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),  // cos ≈ 0.9939
      (2L, Array(0.0f, 1.0f)),  // cos = 0
      (3L, Array(-1.0f, 0.0f))) // cos = −1
      .toDF("vec_id", "embedding")
    val hits = Similarity.rangeSearch(emb.filter(col("vec_id") === 0), emb, 0.5)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(hits.map(_._1).toSet == Set(1L))
    assert(hits.head._2 > 0.99)
    // inclusive boundary: a pair at exactly τ (after rounding) is kept
    val boundary = Similarity.rangeSearch(emb.filter(col("vec_id") === 0), emb, 0.9939)
    assert(boundary.count() == 1L)
  }

  test("int8QuantAudit: per-dim scales, near-lossless on aligned data, zero-dim safe") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.5f, 2.0f, 0.0f)),
      (2L, Array(-1.0f, -2.0f, 0.0f))) // dim 3 is all-zero → scale 0
      .toDF("vec_id", "embedding")
    val out = Similarity.int8QuantAudit(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 3)
    // max-magnitude elements quantize exactly (code ±127 → rec = ±scale)
    assert(out(0L).getAs[Double]("recon_cos") == 1.0)
    assert(out(2L).getAs[Double]("recon_cos") == 1.0)
    // mid-scale element rounds to 64/127 of scale — tiny but nonzero error
    assert(out(1L).getAs[Double]("recon_cos") > 0.9999)
    assert(out(1L).getAs[Double]("mse") > 0.0)
    // no NaN from the zero-scale dimension
    assert(!out.values.exists(r => r.getAs[Double]("recon_cos").isNaN))
  }

  test("emb_stats: exact norms, degenerate detection, per-label isolation") {
    val df = Seq(
      (1L, Array(3f, 4f), 0),
      (2L, Array(0f, 0f), 0),
      (3L, Array(6f, 8f), 1)
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val out = graft.operators.Similarity.queries("emb_stats")(spark, dir).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    assert(out(0L).getAs[Long]("n") == 2L)
    assert(out(0L).getAs[Double]("avg_norm") == 2.5)   // (5 + 0) / 2
    assert(out(0L).getAs[Long]("n_degenerate") == 1L)  // the zero vector
    assert(out(1L).getAs[Double]("min_norm") == 10.0)
    assert(out(1L).getAs[Long]("n_degenerate") == 0L)
  }

  test("zipf: slope/intercept match a directly computed least-squares fit") {
    // counts by construction: "aa"×8, "bb"×4, "cc"×2, "dd"×1
    val text = (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++
      Seq.fill(2)("cc") ++ Seq("dd")).mkString(" ")
    val df = Seq((1L, "en", text)).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.zipf(df, 300).collect().head
    assert(r.getAs[Long]("n_terms") == 4L)
    // expected fit over (ln rank, ln count), rounded exactly as the op does
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val xs = Seq(1, 2, 3, 4).map(k => r6(math.log(k)))
    val ys = Seq(8, 4, 2, 1).map(c => r6(math.log(c)))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4)
    assert(r.getAs[Double]("slope") < 0) // frequency falls with rank
    assert(math.abs(r.getAs[Double]("intercept") - (sy - slope * sx) / n) < 1e-4)
  }

  test("zipf ranks per language independently with the count-then-token tiebreak") {
    val df = Seq(
      (1L, "en", "xx xx yy"),
      (2L, "de", "zz")
    ).toDF("doc_id", "lang", "text")
    // 1 term in de → degenerate fit denominator 0 → NaN slope is fine;
    // the point is per-lang isolation: en's fit sees only en tokens
    val out = TextAnalysis.zipf(df, 300).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_terms")).toMap
    assert(out == Map("en" -> 2L, "de" -> 1L))
  }

  test("quality ratios on a crafted doc") {
    val df = Seq((1L, "the cat sat on a mat, happily.")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df).collect().head
    assert(r.getDouble(1) > 0)      // stopword ratio ("the", "on", "a")
    assert(r.getDouble(2) > 0)      // punct ratio (comma + period)
    assert(r.getDouble(3) == 0.0)   // no digits
  }

  test("bpe-ish pretokenizer splits letter/digit/punct runs with leading-space attach") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    import graft.functions.Fx.normText
    // "it's 42 ok!" → pieces: "it", "'", "s", " 42", " ok", "!"  = 6
    val df = Seq((1L, "It's  42 ok!")).toDF("doc_id", "text")
    val n = df.select(size(regexp_extract_all(normText(col("text")),
        lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0))).cast(LongType)).collect().head.getLong(0)
    assert(n == 6L)
  }

  test("readability: sentence/syllable counts and the Flesch formula on crafted docs") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran! Did it run?"), // 9 words, 3 sentences
      (2L, "no terminators here")                     // fragment → min 1 sentence
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (w1, s1, sy1, f1) = out(1L)
    assert(w1 == 9L && s1 == 3L)
    // vowel groups: e,a,a,e,o,a,i,i,u → 9
    assert(sy1 == 9L)
    assert(f1 == math.rint((206.835 - 1.015 * (9.0 / 3.0) - 84.6 * (9.0 / 9.0)) * 10000) / 10000)
    val (w2, s2, _, _) = out(2L)
    assert(w2 == 3L && s2 == 1L) // fragment clamps to one sentence
  }

  test("bm25: multi-term match outranks single-term; rare term outweighs common; absent docs excluded") {
    val corpus = Seq(
      (1L, "apple apple apple filler filler filler filler filler"), // common term, long
      (2L, "apple banana"),                                         // both terms, short
      (3L, "apple filler"),
      (4L, "apple padding here"),
      (5L, "banana filler"),                                        // rare term (df 2 vs 4)
      (6L, "unrelated words only")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(corpus, Seq("apple", "banana"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 6 has no query term → absent; the 5 hits all present
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // doc 2 hits both terms and is shortest → top rank
    assert(out.head._1 == 2L && out.head._3 == 2L)
    val byId = out.map(t => t._1 -> t._2).toMap
    // banana (df 2) carries more idf than apple (df 4): doc 5 > doc 3 (same shape otherwise)
    assert(byId(5L) > byId(3L))
    // tf saturation: tripled apple in a 4x longer doc must not dominate both-terms doc 2
    assert(byId(2L) > byId(1L))
  }

  test("persisted bm25 index searches identically and prunes postings to the terms' buckets") {
    import java.nio.file.Files
    val corpus = Seq(
      (1L, "apple apple apple filler filler filler filler filler"),
      (2L, "apple banana"),
      (3L, "apple filler"),
      (4L, "apple padding here"),
      (5L, "banana filler"),
      (6L, "unrelated words only")
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft_bm25").toString + "/idx"
    TextAnalysis.writeBm25Index(corpus, path, nBuckets = 16)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toList
    val fromIdx = TextAnalysis.bm25SearchFrom(spark, path,
      Seq("apple", "banana"), topK = 10, nBuckets = 16)
    assert(canon(fromIdx) ==
      canon(TextAnalysis.bm25Search(corpus, Seq("apple", "banana"), topK = 10)))
    // the pruned postings read SCANS a strict subset of the index
    // files (inputFiles ignores partition pruning — read the executed
    // scan's numFiles metric instead)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    }
    val full = scannedFiles(spark.read.parquet(s"$path/seg=0/postings"))
    val pruned = scannedFiles(spark.read.parquet(s"$path/seg=0/postings")
      .filter(col("tok_bucket").isin(
        spark.createDataset(Seq("apple", "banana"))
          .select(pmod(xxhash64(col("value")), lit(16L)))
          .collect().map(_.getLong(0)).toSeq: _*)))
    assert(pruned < full, s"pruned $pruned vs full $full")
  }

  test("segmented bm25: a delta segment supersedes, deletes, and re-posts without touching seg 0") {
    import java.nio.file.Files
    val v1 = Seq(
      (1L, "apple apple"),
      (2L, "apple banana"),
      (3L, "banana filler"),
      (4L, "apple filler")
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft_bm25_seg").toString + "/idx"
    TextAnalysis.writeBm25Index(v1, path, nBuckets = 16)
    // delta: doc 1 updated (loses apple, gains banana), doc 3 deleted
    val delta = Seq((1L, "banana banana")).toDF("doc_id", "text")
    TextAnalysis.appendBm25Segment(delta, Seq(1L, 3L).toDF("doc_id"), path, 1L, nBuckets = 16)
    // ground truth: the same search inline over the POST-delta corpus
    val v2 = Seq(
      (1L, "banana banana"),
      (2L, "apple banana"),
      (4L, "apple filler")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toList
    assert(canon(TextAnalysis.bm25SearchFrom(spark, path,
        Seq("apple", "banana"), topK = 10, nBuckets = 16)) ==
      canon(TextAnalysis.bm25Search(v2, Seq("apple", "banana"), topK = 10)))
  }

  test("bm25 index maintains from a SnapshotStore diff and compacts to one segment unchanged") {
    import java.nio.file.Files
    import graft.operators.SnapshotStore
    val base = Files.createTempDirectory("graft_bm25_store").toString
    val store = new SnapshotStore(spark, s"$base/store", "doc_id")
    val v1 = Seq(
      (1L, "apple apple"), (2L, "apple banana"), (3L, "banana filler"), (4L, "apple filler")
    ).toDF("doc_id", "text")
    store.writeRangePartitioned(v1, 1L, 2)
    val v2 = Seq(
      (1L, "banana banana"), (2L, "apple banana"), (4L, "apple filler"), (5L, "banana apple")
    ).toDF("doc_id", "text")
    store.mergeDelta(1L, 2L,
      Seq((1L, "banana banana"), (5L, "banana apple")).toDF("doc_id", "text"),
      Some(Seq(Tuple1(3L)).toDF("doc_id")))
    val idx = s"$base/idx"
    TextAnalysis.writeBm25Index(store.read(1L), idx, nBuckets = 16)
    val (nPosted, nTomb) = TextAnalysis.updateBm25Index(store, 1L, 2L, idx, 1L, nBuckets = 16)
    assert(nPosted == 2L && nTomb == 2L) // update(1)+insert(5) posted; update(1)+delete(3) tombstoned
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toList
    val expected = canon(TextAnalysis.bm25Search(v2, Seq("apple", "banana"), topK = 10))
    assert(canon(TextAnalysis.bm25SearchFrom(spark, idx,
      Seq("apple", "banana"), topK = 10, nBuckets = 16)) == expected)
    // compaction folds both segments into one; results unchanged
    TextAnalysis.compactBm25Index(spark, idx, 2L)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segDirs = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("seg=")).toSeq
    assert(segDirs == Seq("seg=2"))
    assert(canon(TextAnalysis.bm25SearchFrom(spark, idx,
      Seq("apple", "banana"), topK = 10, nBuckets = 16)) == expected)
  }

  test("hybridSearch: RRF rewards presence in both lists; single-list docs score one reciprocal term") {
    val docs = Seq(
      (1L, "merge merge merge"),   // bm25 rank 1
      (2L, "merge vector filler"), // bm25 rank 2, cos rank 2
      (3L, "plain filler text")    // cos rank 1 only
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),  // the query vector
      (1L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal -> cos rank 3
      (2L, Array(0.9f, 0.1f, 0.0f)),  // close -> cos rank 2
      (3L, Array(0.99f, 0.01f, 0.0f)) // closest -> cos rank 1
    ).toDF("vec_id", "embedding")
    val out = TextAnalysis.hybridSearch(docs, emb,
        Seq("merge", "vector"), queryVecId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getDouble(3)))
    // bm25: doc 2 rank 1 (rare 'vector' outweighs repeated 'merge'),
    // doc 1 rank 2. cosine: doc 3 rank 1, doc 2 rank 2, doc 1 rank 3.
    // RRF: doc 2 = 1/61+1/62, doc 1 = 1/62+1/63, doc 3 (cosine-only)
    // = 1/61 — presence in both lists beats a single rank-1. The
    // query vector itself (id 0) is self-excluded from the cosine
    // list and has no matching text, so it never appears.
    def rrf(ranks: Double*) = BigDecimal(ranks.map(r => 1.0 / (60.0 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 3L))
    assert(out(0)._4 == rrf(1, 2))
    assert(out(1)._4 == rrf(2, 3))
    assert(out(2)._4 == rrf(1))
    // the keyword-less doc carries a null rank on the bm25 side
    assert(out(2)._2 == null && out(2)._3 == 1L)
  }

  test("hybridSearchFrom serves the fused ranking from the two persisted indexes") {
    import graft.operators.Similarity
    import java.nio.file.Files
    // docs: keyword signal on ids 0..7; embeddings: the 4-cluster
    // fixture on the same id space
    val docs = (0 until 40).map { i =>
      (i.toLong, if (i % 8 == 0) "merge vector pipeline" else s"plain filler text $i")
    }.toDF("doc_id", "text")
    val emb = (0 until 40).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(t =>
        (if (t >= 4 * c && t < 4 * c + 4) 4.0f else 0.0f) + ((i + t) % 3) * 0.05f))
    }.toDF("vec_id", "embedding")
    val tmp = Files.createTempDirectory("graft_hybrid_idx").toString
    TextAnalysis.writeBm25Index(docs, s"$tmp/bm25", nBuckets = 16)
    Similarity.writeIvfpqIndex(emb, s"$tmp/ann", nCells = 4, m = 4, ksub = 8, iters = 3)
    val q = emb.filter(col("vec_id") === 8L) // cluster-0 member, also a keyword doc
    val got = TextAnalysis.hybridSearchFrom(spark, s"$tmp/bm25", s"$tmp/ann",
        Seq("merge", "vector"), q, k = 5, poolK = 10, nprobe = 2, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getDouble(3)))
    // parity: the same fusion composed from the branch calls directly
    val bmPool = TextAnalysis.bm25SearchFrom(spark, s"$tmp/bm25",
      Seq("merge", "vector"), topK = 10, nBuckets = 16)
    val wB = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    val bmRanked = bmPool.withColumn("bm25_rank",
        org.apache.spark.sql.functions.row_number().over(wB).cast("long"))
      .select(col("doc_id"), col("bm25_rank"))
    val annRanked = Similarity.ivfpqTopKFrom(spark, s"$tmp/ann", q, k = 10, nprobe = 2)
      .select(col("neighbor_id").as("doc_id"), col("rk").as("cos_rank"))
    val want = TextAnalysis.rrfFuse(bmRanked, annRanked, k = 5)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    // both signals present: some returned doc carries BOTH ranks
    assert(got.exists(t => t._2 != null && t._3 != null))
    assert(got.length == 5)
  }

  test("maybeCompactBm25Index: threshold-gated, allocation-map-aware, search-invariant") {
    import java.nio.file.Files
    val corpus = Seq((1L, "apple apple"), (2L, "apple banana"), (3L, "banana filler"))
      .toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft_bm25_auto").toString + "/idx"
    TextAnalysis.writeBm25Index(corpus, path, nBuckets = 16)
    TextAnalysis.appendBm25Segment(Seq((1L, "banana banana")).toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"), path, 1L, nBuckets = 16)
    // 2 segments ≤ maxSegments=2: no compaction
    assert(TextAnalysis.maybeCompactBm25Index(spark, path, maxSegments = 2).isEmpty)
    // a crashed-but-allocated stream batch holds id 7 in the batch
    // map — compaction must allocate ABOVE it, never reuse it
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_batches/batch-5")
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, true)
    out.write("7".getBytes("UTF-8")); out.close()
    def canon() = TextAnalysis.bm25SearchFrom(spark, path,
        Seq("apple", "banana"), topK = 10, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toList
    val before = canon()
    val newId = TextAnalysis.maybeCompactBm25Index(spark, path, maxSegments = 1)
    assert(newId.contains(8L), s"expected seg 8 (above allocation 7), got $newId")
    assert(canon() == before)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).count(_.startsWith("seg=")) == 1)
    // STALE-LOW `_max`: a marker can sit above `_max` (pre-_max index,
    // or the allocator crashed inside its _max write window). If
    // compaction trusted `_max` alone it would land on the marker's id
    // and the crashed batch's replay would silently skip. _max is now 8
    // (the compaction above); plant a marker holding 12 and recompact.
    val out2 = fs.create(new org.apache.hadoop.fs.Path(s"$path/_batches/batch-6"), true)
    out2.write("12".getBytes("UTF-8")); out2.close()
    val newId2 = TextAnalysis.maybeCompactBm25Index(spark, path, maxSegments = 0)
    assert(newId2.contains(13L), s"expected seg 13 (above marker 12), got $newId2")
    assert(canon() == before)
  }

  test("pruneBatchMarkers bounds _batches to the newest markers, ignoring hidden and non-marker files") {
    import java.nio.file.Files
    val path = Files.createTempDirectory("graft_prunemark").toString + "/idx"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plant(name: String, content: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$path/_batches/$name")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    (0 until 150).foreach(i => plant(s"batch-$i", (i + 1).toString))
    plant("_max", "150")
    plant(".batch-3.tmp", "")
    TextAnalysis.pruneBatchMarkers(fs, path, keepNewest = 100)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/_batches"))
      .map(_.getPath.getName).toSet
    val markers = names.filter(_.startsWith("batch-"))
    assert(markers.size == 100)
    // the NEWEST 100 survive (ids 50..149), _max and hidden leftovers
    // are not the pruner's business
    assert(markers == (50 until 150).map(i => s"batch-$i").toSet)
    assert(names.contains("_max") && names.contains(".batch-3.tmp"))
  }

  test("readAllocMax: _max short-circuits; lost _max re-derives from markers, poison-tolerant") {
    import java.nio.file.Files
    val path = Files.createTempDirectory("graft_allocmax").toString + "/idx"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plant(name: String, content: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$path/_batches/$name")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    plant("batch-1", "3")
    plant("batch-9", "7")
    plant(".batch-4.tmp", "")          // crash-leftover empty tmp
    plant("._max.tmp-cafe", "")        // crashed _max writer's tmp
    plant("batch-2", "garbage")        // unparseable marker content
    // no _max yet: bootstrap scan, skipping hidden + unparseable
    assert(TextAnalysis.readAllocMax(fs, path) == 7L)
    TextAnalysis.writeAllocMax(fs, path, 9L)
    assert(TextAnalysis.readAllocMax(fs, path) == 9L)
    // the delete→rename crash window can only LOSE _max, never corrupt
    // it — a missing _max must re-derive from the marker scan
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_batches/_max"), false)
    assert(TextAnalysis.readAllocMax(fs, path) == 7L)
  }

  test("pq: codes compress to m bytes; ADC search recovers cluster neighbors") {
    import graft.operators.Similarity
    // 4 well-separated clusters in 16 dims: cluster c peaks in dims
    // [4c, 4c+4); members jitter deterministically. ids 0..39 so the
    // k-means first-N seeding sees every cluster.
    val vecs = (0 until 40).map { i =>
      val c = i % 4
      val v = Array.tabulate(16) { d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f
      }
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(emb, 4, 8, 3)
    assert(books.length == 4 && books.forall(_.length == 8))

    val codes = Similarity.pqEncode(emb, books)
    val byId = codes.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(byId.values.forall(_.length == 4))
    // same-cluster twins (i and i+12 share cluster and jitter phase)
    assert(byId(0L).toSeq == byId(12L).toSeq)

    // top-3 neighbors of every query live in the query's own cluster
    val top = Similarity.pqTopK(emb.filter(col("vec_id") < 8), codes, books, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.nonEmpty)
    val wrongCluster = top.filter { case (q, n) => q % 4 != n % 4 }
    assert(wrongCluster.isEmpty, s"cross-cluster neighbors: ${wrongCluster.toList}")
  }

  test("pq codebooks persist bit-exact and search equals the inline path") {
    import graft.operators.Similarity
    import java.nio.file.Files
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 7 + d * 3) % 11).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(emb, 4, 8, 2)
    val path = Files.createTempDirectory("graft_pqbooks").toString + "/books"
    Similarity.savePqBooks(spark, books, path)
    val loaded = Similarity.loadPqBooks(spark, path)
    assert(loaded.length == books.length)
    books.zip(loaded).foreach { case (b, l) =>
      assert(b.length == l.length)
      b.zip(l).foreach { case (v, w) => assert(v.toSeq == w.toSeq) }
    }
    val q = emb.filter(col("vec_id") < 4)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    assert(canon(Similarity.pqTopK(q, Similarity.pqEncode(emb, loaded), loaded, 3)) ==
      canon(Similarity.pqTopK(q, Similarity.pqEncode(emb, books), books, 3)))
  }

  test("opq: learned rotation is orthogonal and cuts quantization error on grid data " +
      "rotated across the subspace boundary") {
    import graft.operators.Similarity
    // Ground truth: vectors sit EXACTLY on a per-subspace grid of 4
    // codewords (PQ with ksub=4 would be lossless)… but observed
    // through a 45° rotation pairing dim t with dim t+8, which smears
    // every subspace into the others. Plain PQ on the observed data
    // pays that smear as quantization error; OPQ's alternation should
    // learn a rotation that re-aligns the grid and collapse the error.
    val d = 16; val sub = 4; val m = 4; val ksub = 4
    // per-subspace codeword grids with DISTINCT step sizes: equal
    // variances would make the top eigenspace degenerate and PCA would
    // return an arbitrary mixing basis (separating equal-variance
    // independent factors is ICA, not PCA — parametric OPQ only
    // promises the non-degenerate case).
    def code(j: Int, c: Int, t: Int): Float = c * (2.0f + 3.0f * j) + t * 0.1f
    val mix = math.sqrt(0.5)
    def observed(g: Array[Float]): Array[Float] = Array.tabulate(d) { i =>
      if (i < 8) ((g(i) - g(i + 8)) * mix).toFloat
      else ((g(i) + g(i - 8)) * mix).toFloat
    }
    // codeword picks independent per (vector, subspace): the joint
    // space has ~4⁴ combinations, so every ROTATED subspace mixes ~16
    // distinct block values — more than ksub=4 can cover losslessly —
    // while the ground-truth basis still needs only 4 per subspace.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 256).map { i =>
      val picks = Array.fill(m)(rnd.nextInt(4))
      val g = Array.tabulate(d)(t => code(t / sub, picks(t / sub), t % sub))
      (i.toLong, observed(g))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val eye = Array.tabulate(d)(i => Array.tabulate(d)(j => if (i == j) 1f else 0f))
    val pqBooks = Similarity.pqTrain(emb, m, ksub, 5)
    val pqErr = Similarity.quantizationError(emb, eye, pqBooks)
    val (r, books) = Similarity.opqTrain(emb, m, ksub, lloydIters = 5, opqIters = 8)
    // R is orthogonal: R·Rᵀ = I
    val dev = (0 until d).flatMap { i =>
      (0 until d).map { j =>
        val dot = (0 until d).map(t => r(i)(t).toDouble * r(j)(t).toDouble).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }
    }.max
    assert(dev < 1e-3, s"R·Rᵀ deviates from I by $dev")
    val opqErr = Similarity.quantizationError(emb, r, books)
    assert(opqErr < 0.5 * pqErr,
      s"opq err $opqErr should be well under plain pq err $pqErr")
  }

  test("opq with zero rotation iterations degenerates to plain pq; rotation persists bit-exact") {
    import graft.operators.Similarity
    import java.nio.file.Files
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(t => ((i * 7 + t * 3) % 11).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val (r0, books0) = Similarity.opqTrain(emb, 4, 8, lloydIters = 2, opqIters = 0)
    assert((0 until 16).forall(i => (0 until 16).forall(j =>
      r0(i)(j) == (if (i == j) 1f else 0f))), "opqIters=0 should return the identity")
    val plain = Similarity.pqTrain(emb, 4, 8, 2)
    books0.zip(plain).foreach { case (b, p) =>
      b.zip(p).foreach { case (v, w) => assert(v.toSeq == w.toSeq) }
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    val q = emb.filter(col("vec_id") < 4)
    assert(canon(Similarity.opqTopK(q, Similarity.opqEncode(emb, r0, books0), r0, books0, 3)) ==
      canon(Similarity.pqTopK(q, Similarity.pqEncode(emb, plain), plain, 3)))
    // a real rotation round-trips through its parquet sidecar bit-exact
    val (r1, _) = Similarity.opqTrain(emb, 4, 8, lloydIters = 2, opqIters = 2)
    val path = Files.createTempDirectory("graft_opq_rot").toString + "/rot"
    Similarity.saveRotation(spark, r1, path)
    val loaded = Similarity.loadRotation(spark, path)
    assert(r1.length == loaded.length)
    r1.zip(loaded).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("opq: ADC search over rotated codes recovers cluster neighbors") {
    import graft.operators.Similarity
    val vecs = (0 until 40).map { i =>
      val c = i % 4
      val v = Array.tabulate(16) { t =>
        (if (t >= 4 * c && t < 4 * c + 4) 4.0f else 0.0f) + ((i + t) % 3) * 0.05f
      }
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val (r, books) = Similarity.opqTrain(emb, 4, 8, lloydIters = 3, opqIters = 2)
    val top = Similarity.opqTopK(emb.filter(col("vec_id") < 8),
      Similarity.opqEncode(emb, r, books), r, books, 3)
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    assert(top.nonEmpty)
    val wrongCluster = top.filter { case (q, n) => q % 4 != n % 4 }
    assert(wrongCluster.isEmpty, s"cross-cluster neighbors: ${wrongCluster.toList}")
  }

  test("persisted ivfpq index searches identically to the inline build") {
    import graft.operators.Similarity
    import java.nio.file.Files
    val vecs = (0 until 40).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft_ivfpq").toString + "/idx"
    Similarity.writeIvfpqIndex(emb, path, nCells = 4, m = 4, ksub = 8, iters = 3)
    val q = emb.filter(col("vec_id") < 8)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    assert(canon(Similarity.ivfpqTopKFrom(spark, path, q, k = 3, nprobe = 2)) ==
      canon(Similarity.ivfpqTopK(emb, q, 4, 4, 8, 3, 3, 2)))
  }

  test("ivfpq: residual codes + probed cells recover cluster neighbors") {
    import graft.operators.Similarity
    val vecs = (0 until 40).map { i =>
      val c = i % 4
      val v = Array.tabulate(16) { d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f
      }
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val top = Similarity.ivfpqTopK(emb, emb.filter(col("vec_id") < 8),
        nCells = 4, m = 4, ksub = 8, iters = 3, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.nonEmpty)
    val wrongCluster = top.filter { case (q, n) => q % 4 != n % 4 }
    assert(wrongCluster.isEmpty, s"cross-cluster neighbors: ${wrongCluster.toList}")
    // every query got a full k=3 result through its probed cells
    val perQuery = top.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perQuery.values.forall(_ == 3), s"short results: $perQuery")
  }

  test("ivfpq codes are bucketed by cell; a probe reads a strict file subset") {
    import graft.operators.Similarity
    import java.nio.file.Files
    val vecs = (0 until 40).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft_ivfpq_cells").toString + "/idx"
    Similarity.writeIvfpqIndex(emb, path, nCells = 4, m = 4, ksub = 8, iters = 3)

    // layout: the codes sidecar is partitioned into cell= directories
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/codes"))
      .map(_.getPath.getName).filter(_.startsWith("cell=")).toSet
    assert(cellDirs.size >= 2, s"expected cell= partitions, got $cellDirs")

    // pruning: probing one cell opens a strict subset of the files a
    // full probe opens, and returns exactly that cell's rows
    val allCells = cellDirs.map(_.drop(5).toLong)
    val full = Similarity.loadProbedCodes(spark, s"$path/codes", allCells)
    val one = Similarity.loadProbedCodes(spark, s"$path/codes", Set(allCells.head))
    assert(one.inputFiles.toSet.subsetOf(full.inputFiles.toSet))
    assert(one.inputFiles.length < full.inputFiles.length)
    assert(one.select(col("cell").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(allCells.head))
    // no probed cell present on disk → empty frame, same schema
    val none = Similarity.loadProbedCodes(spark, s"$path/codes", Set(999L))
    assert(none.count() == 0L &&
      none.columns.toSet == Set("vec_id", "cell", "codes"))

    // union over all cells loses nothing vs the corpus
    assert(full.count() == 40L)
  }

  test("updateIvfpqIndex after mergeDelta is bit-exact with a frozen-quantizer re-encode") {
    import graft.operators.{Similarity, SnapshotStore}
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_ivfpq_incr").toString
    val store = new SnapshotStore(spark, base, "vec_id")
    val vecs = (0 until 48).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f))
    }
    store.writeRangePartitioned(vecs.toDF("vec_id", "embedding"), 1L, 4)
    val idx1 = s"$base/idx1"
    Similarity.writeIvfpqIndex(store.read(1L), idx1, nCells = 4, m = 4, ksub = 8, iters = 3)

    // CoW merge: move two vectors to another cluster, insert two, delete two
    val updates = Seq(
      (1L, Array.tabulate(16)(d => if (d >= 4 && d < 8) 4.0f else 0.1f)),
      (2L, Array.tabulate(16)(d => if (d >= 8 && d < 12) 4.0f else 0.1f))
    ).toDF("vec_id", "embedding")
    val inserts = Seq(
      (100L, Array.tabulate(16)(d => if (d < 4) 4.2f else 0.0f)),
      (101L, Array.tabulate(16)(d => if (d >= 12) 4.2f else 0.0f))
    ).toDF("vec_id", "embedding")
    store.mergeDelta(1L, 2L, updates.unionByName(inserts),
      Some(Seq(Tuple1(7L), Tuple1(8L)).toDF("vec_id")))

    val idx2 = s"$base/idx2"
    val (carried, reencoded) = Similarity.updateIvfpqIndex(spark, store, 1L, 2L, idx1, idx2)
    assert(carried > 0L, "some untouched files' codes must carry")
    assert(reencoded > 0L, "rewritten files' vectors must re-encode")

    // identity: incremental result == whole-v2 re-encode under the SAME
    // frozen quantizer, code for code
    val cents = Similarity.loadCentroids(spark, s"$idx1/centroids")
    val books = Similarity.loadPqBooks(spark, s"$idx1/books")
    def canonCodes(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Array[Byte]]("codes").toSeq)).toSet
    val incr = canonCodes(spark.read.parquet(s"$idx2/codes"))
    val full = canonCodes(Similarity.ivfpqEncode(store.read(2L), cents, books))
    assert(incr == full)
    assert(incr.size == 48 && !incr.exists(c => c._1 == 7L || c._1 == 8L))
    assert(carried + reencoded == 48L)

    // the updated artifact searches end-to-end
    val res = Similarity.ivfpqTopKFrom(spark, idx2,
      store.read(2L).filter(col("vec_id") < 4), k = 3, nprobe = 2)
    assert(res.groupBy("query_id").count().collect().forall(_.getLong(1) == 3L))
  }

  test("staleness gauge trips on a drifted corpus across batches; retrain restores error and recall") {
    import graft.operators.{Similarity, SnapshotStore}
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_ivfpq_drift").toString
    val store = new SnapshotStore(spark, base, "vec_id")
    // v1 corpus: 4 clean clusters in dims [0,16); jitter has more
    // distinct patterns (11) than PQ codewords (8) so the baseline
    // reconstruction error is small but strictly positive
    def clusterVec(i: Int) = {
      val c = i % 4
      Array.tabulate(16)(d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i * 7 + d * 3) % 11) * 0.07f)
    }
    store.writeRangePartitioned(
      (0 until 48).map(i => (i.toLong, clusterVec(i))).toDF("vec_id", "embedding"), 1L, 4)
    val idx1 = s"$base/idx1"
    Similarity.writeIvfpqIndex(store.read(1L), idx1, nCells = 4, m = 4, ksub = 8, iters = 3)
    val (b0, l0) = Similarity.loadGauge(spark, s"$idx1/gauge").get
    assert(b0 > 0.0 && l0 == b0, "fresh index: last == baseline")

    // drift in three batches: vectors migrate to a region the v1
    // quantizer never saw (large magnitude, different dims), replacing
    // a third of the corpus each time
    def driftVec(i: Int) = Array.tabulate(16)(d =>
      (if (d % 4 == i % 4) 9.0f else -7.0f) + ((i * 5 + d) % 7) * 0.3f)
    def batch(n: Long) = ((n - 2) * 16 until (n - 1) * 16)
      .map(i => (i.toLong, driftVec(i.toInt))).toDF("vec_id", "embedding")
    var gauges = List.empty[Double]
    (2L to 4L).foreach { v =>
      store.mergeDelta(v - 1, v, batch(v))
      Similarity.updateIvfpqIndex(spark, store, v - 1, v,
        s"$base/idx${v - 1}", s"$base/idx$v")
      val (b, l) = Similarity.loadGauge(spark, s"$base/idx$v/gauge").get
      assert(b == b0, "frozen chain carries its baseline")
      gauges ::= l / b
    }
    // every drifted delta reads far above baseline — the gauge trips
    assert(gauges.forall(_ > 2.0), s"drift ratios: $gauges")

    // same final merge, but with the retrain trigger armed: the v4
    // update abandons the frozen carry and rebuilds
    val (carried, reencoded) = Similarity.updateIvfpqIndex(spark, store, 3L, 4L,
      s"$base/idx3", s"$base/idx4_retrained", retrainRatio = Some(2.0))
    assert(carried == 0L && reencoded == 48L, s"expected full rebuild, got ($carried, $reencoded)")
    val (b4, l4) = Similarity.loadGauge(spark, s"$base/idx4_retrained/gauge").get
    assert(l4 == b4, "retrain resets the gauge")
    // retrained quantizer fits the drifted corpus again: its residual
    // error sits far below the frozen chain's drifted-delta error
    val frozenDeltaMse = gauges.head * b0
    assert(b4 < frozenDeltaMse / 2.0,
      s"retrained baseline $b4 vs frozen-chain delta mse $frozenDeltaMse")
    // and the retrained artifact passes the planted recall gate
    val v4 = store.read(4L)
    val q = Similarity.plantedQueries(v4, 48)
    val gate = Similarity.recallSummary(
      Similarity.ivfpqTopKFrom(spark, s"$base/idx4_retrained", q, k = 5, nprobe = 2),
      Similarity.bruteForceTopKL2(q, v4, 1), k = 5, threshold = 0.7)
      .collect().head
    assert(gate.getBoolean(2), s"retrained recall gate failed: $gate")
  }

  test("opq rotation rides the persisted ivfpq index: search ≡ inline build on the rotated corpus") {
    import graft.operators.Similarity
    import java.nio.file.Files
    val vecs = (0 until 40).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val (r, _) = Similarity.opqTrain(emb, 4, 8, lloydIters = 2, opqIters = 2)
    val path = Files.createTempDirectory("graft_opq_idx").toString + "/idx"
    Similarity.writeIvfpqIndex(emb, path, nCells = 4, m = 4, ksub = 8, iters = 3,
      rotation = Some(r))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/rotation")),
      "rotation sidecar must persist beside centroids/books")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    // queries go in UNROTATED — ivfpqTopKFrom applies the sidecar R —
    // and the result must equal the inline build over R·x with R·q
    val q = emb.filter(col("vec_id") < 8)
    assert(canon(Similarity.ivfpqTopKFrom(spark, path, q, k = 3, nprobe = 2)) ==
      canon(Similarity.ivfpqTopK(Similarity.rotate(emb, r), Similarity.rotate(q, r),
        4, 4, 8, 3, 3, 2)))
  }

  test("updateIvfpqIndex carries the OPQ rotation: incremental codes ≡ frozen-quantizer re-encode of R·x") {
    import graft.operators.{Similarity, SnapshotStore}
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_opq_incr").toString
    val store = new SnapshotStore(spark, base, "vec_id")
    val vecs = (0 until 48).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(d =>
        (if (d >= 4 * c && d < 4 * c + 4) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f))
    }
    store.writeRangePartitioned(vecs.toDF("vec_id", "embedding"), 1L, 4)
    val (r, _) = Similarity.opqTrain(store.read(1L), 4, 8, lloydIters = 2, opqIters = 2)
    val idx1 = s"$base/idx1"
    Similarity.writeIvfpqIndex(store.read(1L), idx1, nCells = 4, m = 4, ksub = 8,
      iters = 3, rotation = Some(r))
    val updates = Seq(
      (1L, Array.tabulate(16)(d => if (d >= 4 && d < 8) 4.0f else 0.1f))
    ).toDF("vec_id", "embedding")
    val inserts = Seq(
      (100L, Array.tabulate(16)(d => if (d < 4) 4.2f else 0.0f))
    ).toDF("vec_id", "embedding")
    store.mergeDelta(1L, 2L, updates.unionByName(inserts),
      Some(Seq(Tuple1(7L)).toDF("vec_id")))
    val idx2 = s"$base/idx2"
    val (carried, reencoded) = Similarity.updateIvfpqIndex(spark, store, 1L, 2L, idx1, idx2)
    assert(carried > 0L && reencoded > 0L)
    // sidecar carried bit-exact to the new index version
    val r2 = Similarity.loadRotation(spark, s"$idx2/rotation")
    r.zip(r2).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // identity: incremental == whole-v2 encode of R·x under the frozen
    // quantizer (cells + books were TRAINED in rotated space)
    val cents = Similarity.loadCentroids(spark, s"$idx1/centroids")
    val books = Similarity.loadPqBooks(spark, s"$idx1/books")
    def canonCodes(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Array[Byte]]("codes").toSeq)).toSet
    assert(canonCodes(spark.read.parquet(s"$idx2/codes")) ==
      canonCodes(Similarity.ivfpqEncode(
        Similarity.rotate(store.read(2L), r), cents, books)))
  }

  test("opq-ivfpq index recall on the cross-subspace-rotated grid beats plain ivfpq") {
    import graft.operators.Similarity
    import java.nio.file.Files
    // the opqTrain fixture: per-subspace grids observed through a 45°
    // rotation pairing dim t with t+8 — plain PQ pays the smear,
    // OPQ re-aligns it (error-cut spec-pinned above); here the GAIN
    // must survive the whole persisted-index path
    val d = 16; val sub = 4; val m = 4; val ksub = 4
    def code(j: Int, c: Int, t: Int): Float = c * (2.0f + 3.0f * j) + t * 0.1f
    val mix = math.sqrt(0.5)
    def observed(g: Array[Float]): Array[Float] = Array.tabulate(d) { i =>
      if (i < 8) ((g(i) - g(i + 8)) * mix).toFloat
      else ((g(i) + g(i - 8)) * mix).toFloat
    }
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 256).map { i =>
      val picks = Array.fill(m)(rnd.nextInt(4))
      val g = Array.tabulate(d)(t => code(t / sub, picks(t / sub), t % sub))
      (i.toLong, observed(g))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    // exact L2 ground truth, driver-side (256×32 pairs)
    def l2sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val all = vecs.toMap
    val queries = vecs.take(32)
    val truth = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid).sortBy(t => (l2sq(qv, t._2), t._1))
        .take(5).map(_._1).toSet
    }.toMap
    def recallOf(idx: String): Double = {
      val got = Similarity.ivfpqTopKFrom(spark, idx,
          emb.filter(col("vec_id") < 32), k = 5, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      queries.map { case (qid, _) =>
        (truth(qid) intersect got.getOrElse(qid, Set.empty)).size / 5.0
      }.sum / queries.size
    }
    val tmp = Files.createTempDirectory("graft_opq_recall").toString
    Similarity.writeIvfpqIndex(emb, s"$tmp/plain", nCells = 4, m = m, ksub = ksub,
      iters = 3)
    val (r, _) = Similarity.opqTrain(emb, m, ksub, lloydIters = 5, opqIters = 8)
    Similarity.writeIvfpqIndex(emb, s"$tmp/opq", nCells = 4, m = m, ksub = ksub,
      iters = 3, rotation = Some(r))
    val (plainR, opqR) = (recallOf(s"$tmp/plain"), recallOf(s"$tmp/opq"))
    assert(opqR > plainR, s"opq recall $opqR should beat plain $plainR")
    assert(opqR > 0.6, s"opq recall $opqR unexpectedly low")
  }

  test("recallSummary: perfect match passes, missing queries count as zero, empty approx fails the gate") {
    import graft.operators.Similarity
    val exact = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("query_id", "neighbor_id")
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.head()
      (r.getLong(0), r.getLong(1), r.getBoolean(2))
    }
    // perfect recall
    assert(row(Similarity.recallSummary(exact, exact, 5, 0.99)) == (3L, 5L, true))
    // query 3 entirely absent from approx → counts as recall 0, not
    // dropped: 2/3 ≈ 0.67 fails a 0.7 gate and passes 0.6
    val partial = Seq((1L, 10L), (2L, 20L)).toDF("query_id", "neighbor_id")
    assert(row(Similarity.recallSummary(partial, exact, 5, 0.7)) == (3L, 5L, false))
    assert(row(Similarity.recallSummary(partial, exact, 5, 0.6)) == (3L, 5L, true))
    // collapsed index (empty result) must fail, never pass vacuously
    assert(row(Similarity.recallSummary(exact.limit(0), exact, 5, 0.1)) == (3L, 5L, false))
    // planted queries re-id above the corpus and stay near their source
    val emb = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(t => (i * 3 + t).toFloat))).toDF("vec_id", "embedding")
    val q = Similarity.plantedQueries(emb, 5)
    assert(q.count() == 5)
    assert(q.select(min(col("vec_id"))).head().getLong(0) == (1L << 40))
    val nn = Similarity.bruteForceTopK(q, emb, 1).collect()
      .map(r => r.getLong(0) - (1L << 40) -> r.getLong(1)).toMap
    assert(nn == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("zero-norm vectors and centroids assign deterministically, never via NaN") {
    import graft.operators.Similarity
    // a degenerate all-zero CENTROID must never win an assignment;
    // an all-zero VECTOR (every cos = -inf) must land in cell 0
    val cents = Array(Array(0f, 0f), Array(1f, 0f), Array(0f, 1f))
    val emb = Seq(
      (1L, Array(2f, 0.1f)),
      (2L, Array(0.1f, 3f)),
      (3L, Array(0f, 0f))
    ).toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssignTo(emb, cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(assigned(1L) == 1L && assigned(2L) == 2L)
    assert(assigned(3L) == 0L)
    // end-to-end: an IVFPQ search over a corpus containing a zero
    // vector completes and returns full results for the normal queries
    val vecs = (0 until 24).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(8)(d =>
        (if (d >= 2 * c && d < 2 * c + 2) 4.0f else 0.0f) + ((i + d) % 3) * 0.05f))
    } :+ (24L -> Array.fill(8)(0f))
    val corpus = vecs.toDF("vec_id", "embedding")
    val res = Similarity.ivfpqTopK(corpus, corpus.filter(col("vec_id") < 4),
        nCells = 3, m = 4, ksub = 8, iters = 2, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.groupBy(_._1).values.forall(_.length == 3))
  }

  test("pq/ivfpq query batches past maxQueryRows fail fast instead of collecting") {
    import graft.operators.Similarity
    val vecs = (0 until 30).map(i => (i.toLong, Array.tabulate(8)(d => (i * d % 5).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 2)
    val codes = Similarity.pqEncode(emb, books)
    val exPq = intercept[IllegalArgumentException](
      Similarity.pqTopK(emb, codes, books, k = 3, maxQueryRows = 10))
    assert(exPq.getMessage.contains("pqTopK"))
    val exIvf = intercept[IllegalArgumentException](
      Similarity.ivfpqTopK(emb, emb, nCells = 3, m = 4, ksub = 8,
        iters = 2, k = 3, nprobe = 2, maxQueryRows = 10))
    assert(exIvf.getMessage.contains("ivfpqSearch"))
    // under the cap the same calls succeed
    assert(Similarity.pqTopK(emb.filter(col("vec_id") < 5), codes, books,
      k = 3, maxQueryRows = 10).count() > 0)
  }

  test("piiScan counts emails, urls, ipv4s, and long digit runs") {
    val df = Seq(
      (1L, "contact alice@example.com or bob@test.org via https://example.com/page now"),
      (2L, "server at 10.0.0.1 rang 5551234567 twice"),
      (3L, "nothing sensitive here just words")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((2L, 1L, 0L, 0L, true)))
    assert(out(2L) == ((0L, 0L, 1L, 1L, true)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, false)))
  }

  test("topTerms ranks per language with deterministic ties and the TopKPerKey rewrite") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val df = Seq(
      (1L, "en", "spark spark spark tungsten tungsten catalyst"),
      (2L, "en", "catalyst barely"),
      (3L, "de", "fahrrad fahrrad strasse")
    ).toDF("doc_id", "lang", "text")
    val top = TextAnalysis.topTerms(df, 5, 2)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey rewrite, got:\n$plan")
    val rows = top.collect().map(r => (r.getString(0), r.getLong(3), r.getString(1), r.getLong(2))).toList
      .sortBy(t => (t._1, t._2))
    // en: spark(3), catalyst(2) — tungsten(2) loses the tie alphabetically
    assert(rows == List(
      ("de", 1L, "fahrrad", 2L), ("de", 2L, "strasse", 1L),
      ("en", 1L, "spark", 3L), ("en", 2L, "catalyst", 2L)))
  }

  test("langid picks the language with most stopword hits, ties alphabetical") {
    val df = Seq(
      (1L, "en", "the cat and the dog is in a house of cards"),
      (2L, "de", "der hund und die katze ist ein tier mit fell")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langid(df).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
  }

  test("bruteForceTopK: nearest neighbor of a vector is its duplicate") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df.filter(col("vec_id") === 1), df, 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(top.head._1 == 2L && top.head._2 == 1.0)
    assert(top(1)._1 == 4L)
  }

  test("ivfAssign: every vector gets exactly one cell; centroids assign to themselves") {
    val df = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))).toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(df, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(assigned.size == 30)
    assert(assigned.values.forall(c => c >= 0 && c < 4))
    (0L until 4L).foreach(c => assert(assigned(c) == c)) // self is the nearest centroid
  }

  test("ivfTopK salted equals unsalted (skew guard preserves results)") {
    val df = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => math.cos(i * 3 + j).toFloat))).toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    assert(canon(Similarity.ivfTopK(df, 4, 3)) == canon(Similarity.ivfTopK(df, 4, 3, salt = 3)))
  }

  test("ivfTopKProbed: visiting more cells recovers boundary neighbors single-probe misses") {
    // two tight clusters plus queries sitting BETWEEN them: the
    // nearest cell holds only half the true neighbors, so nprobe=1
    // recall is capped and nprobe=2 must strictly beat it
    val rnd = new scala.util.Random(13)
    def member(center: Int, dim: Int = 8): Array[Float] =
      Array.tabulate(dim)(j => (if (j == center) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
    def boundary(dim: Int = 8): Array[Float] =
      Array.tabulate(dim)(j => (if (j == 0 || j == 4) 0.7f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
    val corpus = ((0L until 20L).map(i => (i, member(0))) ++
      (20L until 40L).map(i => (i, member(4)))).toDF("vec_id", "embedding")
    val queries = (100L until 110L).map(i => (i, boundary())).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(corpus, 2, 5)
    val exact = Similarity.bruteForceTopK(queries, corpus, 6)
    def recall(nprobe: Int) = recallVsExact(
      Similarity.ivfTopKProbed(queries, corpus, cents, 6, nprobe), exact)
    val one = recall(1)
    val two = recall(2)
    assert(two > one, s"nprobe=2 recall $two should beat nprobe=1 $one")
    assert(two == 1.0, s"both cells probed covers every exact neighbor, got $two")
  }

  private def recallVsExact(ann: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame): Double = {
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = pairs(exact)
    pairs(ann).intersect(e).size.toDouble / e.size
  }

  test("ivfTopK: k-means centroids beat first-N seeding on a clustered corpus") {
    // Two well-separated clusters; ids 0 and 1 (the first-N seeds) are
    // BOTH in cluster 0, so first-N seeding has no centroid near
    // cluster 1 and noise decides which cell its members land in —
    // splitting true neighbors across cells. k-means recovers the
    // cluster means.
    val rnd = new scala.util.Random(11)
    def member(center: Int, dim: Int = 8): Array[Float] =
      Array.tabulate(dim)(j => (if (j == center) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.2f)
    val vecs = (0L until 30L).map(i => (i, member(0))) ++
      (30L until 60L).map(i => (i, member(4)))
    val emb = vecs.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, emb, 5)
    val firstN = recallVsExact(Similarity.ivfTopK(emb, 2, 5), exact)
    val kmeans = recallVsExact(Similarity.ivfTopK(emb, 2, 5, kmeansIters = 5), exact)
    assert(kmeans > firstN, s"kmeans recall $kmeans should beat first-N $firstN")
    assert(kmeans > 0.9)
  }

  test("autoCells sizes ~sqrt(n) with sane clamps") {
    assert(Similarity.autoCells(0L) == 1)
    assert(Similarity.autoCells(1L) == 1)
    assert(Similarity.autoCells(100L) == 10)
    assert(Similarity.autoCells(1000000L) == 1000)
    assert(Similarity.autoCells(Long.MaxValue) == 65536)
  }

  test("persisted centroids: save/load round trip + amortized search parity") {
    val df = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 5 + j).toFloat))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, 4, 3)
    val path = java.nio.file.Files.createTempDirectory("graft_cents").toString + "/c"
    Similarity.saveCentroids(spark, cents, path)
    val loaded = Similarity.loadCentroids(spark, path)
    assert(loaded.length == cents.length)
    assert(loaded.zip(cents).forall { case (a, b) => a.sameElements(b) }, "bit-exact round trip")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    // querying with the persisted centroids == rebuilding them inline
    assert(canon(Similarity.ivfTopKFrom(df, loaded, 3)) ==
      canon(Similarity.ivfTopK(df, 4, 3, kmeansIters = 3)))
  }

  test("ivfTopKAuto equals ivfTopK at the auto-tuned cell count") {
    val df = (0L until 36L).map(i =>
      (i, Array.tabulate(8)(j => math.cos(i * 3 + j).toFloat))).toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toList
    // n=36 → 6 cells
    assert(canon(Similarity.ivfTopKAuto(df, 3)) == canon(Similarity.ivfTopK(df, 6, 3)))
  }

  test("lshTopK multi-probe recovers neighbors single-probe misses") {
    val rnd = new scala.util.Random(5)
    val emb = (0L until 80L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, emb, 3)
    val single = recallVsExact(Similarity.lshTopK(emb, 10, 3), exact)
    val multi = recallVsExact(Similarity.lshTopK(emb, 10, 3, probes = 6), exact)
    assert(multi > single, s"multi-probe recall $multi should beat single $single")
  }

  test("codegen hyperplane signature is bit-exact with the typed-Dataset path") {
    val rnd = new scala.util.Random(13)
    val emb = (0L until 50L).map(i =>
      (i, Array.fill(24)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("vec_id", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toList
    assert(canon(Similarity.lshSignature(emb, 20)) ==
      canon(Similarity.lshSignatureTyped(emb, 20)))
    // and through the SQL surface
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    emb.createOrReplaceTempView("graft_hp_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, hyperplane_sig(embedding, 20) AS bucket FROM graft_hp_emb")
    assert(canon(viaSql) == canon(Similarity.lshSignature(emb, 20)))
  }

  test("lshTopK returns only same-bucket pairs with valid cosines") {
    val df = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(df, 6, 3).collect()
    assert(out.forall(r => r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
  }

  test("repetition profiles a looping doc vs a clean one") {
    val df = Seq(
      (1L, "spam spam spam spam"),              // 4 tokens, 1 distinct; 3 bigrams all "spam spam"
      (2L, "all tokens here are distinct ok"),  // no repetition at all
      (3L, "one")                               // single token → zero bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val loop = out(1L)
    assert(loop.getLong(1) == 4L)               // n_tokens
    assert(loop.getDouble(2) == 0.75)           // dup_tok_frac = 1 - 1/4
    assert(loop.getLong(3) == 3L)               // n_bigrams
    assert(math.abs(loop.getDouble(4) - 0.6667) < 1e-9) // 1 - 1/3
    assert(loop.getDouble(5) == 1.0)            // top bigram claims all
    val clean = out(2L)
    assert(clean.getDouble(2) == 0.0 && clean.getDouble(4) == 0.0)
    assert(math.abs(clean.getDouble(5) - 0.2) < 1e-9) // 5 bigrams, each once
    val single = out(3L)
    assert(single.getLong(3) == 0L && single.getDouble(4) == 0.0 && single.getDouble(5) == 0.0)
  }

  test("chunkTokens tiles with overlap and the tail keeps the remainder") {
    // 7 tokens, win=4, stride=3 → starts 1,4,7: [a b c d], [d e f g], [g]
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, 4, 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(c => (c._1, c._2)).toSeq == Seq((0L, 4L), (1L, 4L), (2L, 1L)))
    // chunk ids are CONTENT md5s: the overlap token 'd' appears in both
    // chunk 0 and 1, but their ids differ because content differs
    assert(out.map(_._3).distinct.length == 3)
    // a doc shorter than the window is one whole chunk
    val short = TextAnalysis.chunkTokens(Seq((2L, "x y")).toDF("doc_id", "text"), 4, 3).collect()
    assert(short.length == 1 && short.head.getLong(2) == 2L)
  }
}
