package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.functions.Fx._
import graft.sources.Tables

/** Deduplication operators for training-data pipelines (SURVEY §2
  * group 3): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture: nothing here is O(n²) on the full corpus. Exact
  * dedup is one hash-groupBy; MinHash/LSH turns near-dup into an
  * equi-join on band keys; SimHash buckets by hash prefix. The
  * all-pairs Jaccard entry (`dedup_ngram`) joins on shared shingles —
  * an equi-join whose fan-out is bounded by the [[capShingleDf]]
  * document-frequency cut (a shingle in f docs emits O(f²) pairs;
  * boilerplate shingles are dropped from the representation before
  * the join), the standard prefix-filter shape; candidates only ever
  * meet through a shared informative token, never a cross join.
  */
object Dedup {

  /** (doc_id, shingle) exploded pairs over distinct word k-shingles.
    *
    * Implemented as a typed flatMap rather than
    * `explode(shingles(tokens(c)))`: higher-order array functions have
    * no doGenCode, so the declarative version is interpreted
    * per-element (and a generator additionally re-inlines its argument
    * expression per produced element — O(len²) regex evaluations).
    * The flatMap is one narrow, embarrassingly-parallel pass; the
    * declarative [[graft.functions.Fx.shingles]] stays available for
    * in-plan use. Semantics match the oracle exactly: whitespace
    * normalize → lowercase → split → k-gram → per-doc distinct. */
  def docShingles(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => shingleSeq(text, k).iterator.map((id, _)) }
      .toDF("doc_id", "shingle")
  }

  /** JVM kernel of [[docShingles]] for ONE document — shared by the
    * batch explode and streaming gates (StreamOps.decontaminateStream)
    * so both paths shingle bit-identically. */
  def shingleSeq(text: String, k: Int): Seq[String] = {
    val toks = text.trim.replaceAll("\\s+", " ")
      .toLowerCase(java.util.Locale.ROOT).split(" ")
    if (toks.length < k) Nil
    else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
  }

  /** Exact-dup groups: normalized-text md5 → group size + canonical
    * survivor (lowest doc_id). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(normText(col("text"))).as("text_hash"))
      .groupBy("text_hash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

  /** Drop shingles whose document frequency exceeds `maxDf` from a
    * (doc_id, shingle) index. A shingle appearing in f documents emits
    * O(f²) candidate pairs through the intersection self-join — on a
    * real crawl, boilerplate shingles ("terms of service apply") make
    * the join quadratic while contributing ~zero Jaccard information
    * (they are shared by everything). Removing them from the
    * REPRESENTATION (both intersection and set sizes) keeps the
    * measure self-consistent: it is exact Jaccard over the capped
    * shingle sets, the standard df-cut from prefix-filtering
    * literature. The df aggregate is map-side combinable and the
    * filter is a broadcast-able semi-join (df survivors over the cap
    * are few — that is the point). */
  def capShingleDf(sh: DataFrame, maxDf: Int): DataFrame = {
    val hot = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("shingle")
    sh.join(broadcast(hot), Seq("shingle"), "left_anti")
  }

  /** Shared core of [[ngramJaccardPairs]] and [[containmentPairs]]:
    * per candidate pair (doc_a < doc_b meeting through ≥1 shared
    * shingle), the intersection size and both capped-set sizes.
    *
    * One materialized shingle index feeds the doc-size aggregate and
    * BOTH self-join sides (computed once, not three times). The sides
    * get disjoint column names: an aliased same-lineage self-join
    * otherwise degrades to a nested-loop. Materialized via EAGER
    * localCheckpoint rather than persist(): a persist() here could
    * never be unpersisted (consumption is lazy, downstream of the
    * returned plan), so repeated calls would pin executor storage for
    * the session's lifetime. Checkpoint blocks are owned by the RDD,
    * not the CacheManager, so the ContextCleaner frees them as soon as
    * the returned plan is garbage-collected. At 100 TB swap for a
    * bucketed-by-shingle table write — same plan shape, explicit
    * lifecycle (and executor-loss tolerance, which localCheckpoint
    * trades away). */
  def pairOverlapStats(docs: DataFrame, k: Int, maxDf: Int): DataFrame = {
    val sh = capShingleDf(docShingles(docs, k), maxDf).materialize()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val inter = shA.join(shB,
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
  }

  private val pairStatsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int, Int), DataFrame]()

  /** [[pairOverlapStats]] MATERIALIZED once per (session, corpus
    * identity, k, maxDf) and shared: Jaccard, containment, and cluster
    * audits all consume the same intersection/size statistics, and the
    * candidate self-join that produces them is the most expensive pass
    * in the dedup suite — an audit that asks for two or three measures
    * should pay it once, not per measure. The checkpointed artifact is
    * the (doc_a, doc_b, n_inter, n_a, n_b) pair rows — the post-join,
    * post-aggregate output, orders of magnitude smaller than the
    * shingle index. Entries pin their checkpoint blocks for the
    * session's lifetime; the map is bounded by one entry per (corpus,
    * params), which an audit run keeps to a handful. At 100 TB the
    * same sharing shape is a written stats table beside the corpus
    * snapshot, exactly like [[writeShingleIndex]]. */
  def pairOverlapStatsShared(docs: DataFrame, corpusKey: String,
      k: Int, maxDf: Int = 100): DataFrame =
    pairStatsMemo.computeIfAbsent(
      (docs.sparkSession.hashCode, corpusKey, k, maxDf),
      _ => pairOverlapStats(docs, k, maxDf).materialize())

  /** The Jaccard threshold filter over [[pairOverlapStats]] rows:
    * exact n-gram Jaccard ≥ `num/den`, integer arithmetic (no float
    * boundary ambiguity). */
  def jaccardFromStats(stats: DataFrame, num: Int, den: Int): DataFrame =
    stats
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") * den >= col("n_union") * num)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        round(col("n_inter").cast(DoubleType) / col("n_union"), 4).as("jaccard"))

  /** The containment threshold filter over [[pairOverlapStats]] rows:
    * |A∩B| / min(|A|,|B|) ≥ `num/den`. */
  def containmentFromStats(stats: DataFrame, num: Int, den: Int): DataFrame =
    stats
      .withColumn("n_min", least(col("n_a"), col("n_b")))
      .filter(col("n_inter") * den >= col("n_min") * num)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_min"),
        round(col("n_inter").cast(DoubleType) / col("n_min"), 4).as("containment"))

  /** Near-dup candidate pairs with exact n-gram Jaccard ≥ `num/den`
    * (threshold kept rational so the filter is integer arithmetic —
    * no float boundary ambiguity). `maxDf` caps shingle document
    * frequency before the candidate self-join ([[capShingleDf]]);
    * pass Int.MaxValue for the uncapped measure. */
  def ngramJaccardPairs(docs: DataFrame, k: Int, num: Int, den: Int,
      maxDf: Int = 100): DataFrame =
    jaccardFromStats(pairOverlapStats(docs, k, maxDf), num, den)

  /** Containment near-dup pairs — the QUOTE/subset detector Jaccard
    * structurally misses: a short document fully quoted inside a long
    * one has Jaccard ≈ |A|/|B| (tiny when B is long) but containment
    * C = |A∩B| / min(|A|,|B|) ≈ 1. The asymmetric measure is the
    * standard companion to Jaccard in near-dup literature (Broder's
    * containment): it catches page-within-page, quoted excerpts, and
    * template-plus-payload duplication that a symmetric threshold
    * passes through.
    *
    * Same candidate machinery as [[ngramJaccardPairs]] (shingle
    * equi-join, df-capped, integer-rational threshold filter) — a pair
    * only ever meets through a shared shingle, never a cross join, so
    * the scale posture is identical. */
  def containmentPairs(docs: DataFrame, k: Int, num: Int, den: Int,
      maxDf: Int = 100): DataFrame =
    containmentFromStats(pairOverlapStats(docs, k, maxDf), num, den)

  /** (doc_id, win) pairs over distinct character windows of `k` chars
    * sampled every `stride` positions of the normalized text — the
    * character-level twin of [[docShingles]] for EXACT substring
    * duplication (copied license blocks, quoted spans, mirrored
    * paragraphs whose word-shingle Jaccard is diluted by surrounding
    * text). Stride trades recall granularity for index size: a shared
    * span of length ≥ k + stride - 1 always contributes at least one
    * common sampled window on BOTH sides only if the docs align on the
    * stride grid, so stride stays small (the classic suffix-array
    * alternative at corpus scale: windows → group by content → df).
    * Same typed-flatMap shape as docShingles (a generator over
    * `transform(sequence(...), substr)` re-inlines the normalization
    * per element — O(len²/stride) regex work). */
  def docCharWindows(docs: DataFrame, k: Int, stride: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => charWindowSeq(text, k, stride).iterator.map((id, _)) }
      .toDF("doc_id", "win")
  }

  /** JVM kernel of [[docCharWindows]] for ONE document (normalize →
    * windows at positions 1, 1+stride, … ≤ len-k+1 → distinct). */
  def charWindowSeq(text: String, k: Int, stride: Int): Seq[String] = {
    val nt = text.trim.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
    if (nt.length < k) Nil
    else (0 to nt.length - k by stride).map(p => nt.substring(p, p + k)).distinct
  }

  /** Cross-document EXACT substring duplication (the dedup pass of
    * Lee et al.'s "Deduplicating Training Data" at window granularity):
    * pairs (doc_a < doc_b) sharing ≥ 1 sampled k-char window, with the
    * count of distinct shared windows — long verbatim overlaps score
    * high even when the docs' overall Jaccard is low. The candidate
    * join is the SAME df-capped equi-join as [[pairOverlapStats]]
    * (windows in > maxDf docs are boilerplate: dropped before the join,
    * so fan-out stays bounded); pairs only meet through a shared
    * window, never a cross join. */
  def substringDupPairs(docs: DataFrame, k: Int, stride: Int,
      maxDf: Int = 100): DataFrame = {
    val w = capWindowDf(docCharWindows(docs, k, stride), maxDf).materialize()
    substringPairsFrom(w, col("win"))
  }

  /** The 100 TB shuffle-width variant: joins on `xxhash64(win)` (8
    * bytes) instead of the k-char window string (k bytes + header) —
    * the candidate exchange carries ~k/8× less data. A hash collision
    * could only ADD a pair (never drop one); with 64-bit hashes over
    * ≤ ~10¹² windows the expected number of colliding pairs is ≪ 1,
    * and the spec pins pair-set equality with the exact path on real
    * corpora. */
  def substringDupPairsHashed(docs: DataFrame, k: Int, stride: Int,
      maxDf: Int = 100): DataFrame = {
    val w = capWindowDf(docCharWindows(docs, k, stride), maxDf)
      .select(col("doc_id"), xxhash64(col("win")).as("win"))
      .materialize()
    substringPairsFrom(w, col("win"))
  }

  private def capWindowDf(w: DataFrame, maxDf: Int): DataFrame = {
    val hot = w.groupBy("win").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("win")
    w.join(broadcast(hot), Seq("win"), "left_anti")
  }

  private def substringPairsFrom(w: DataFrame, winCol: Column): DataFrame = {
    val a = w.select(col("doc_id").as("doc_a"), winCol.as("win_a"))
    val b = w.select(col("doc_id").as("doc_b"), winCol.as("win_b"))
    a.join(b, col("win_a") === col("win_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Persist the (doc_id, shingle) index as a table bucketed+sorted by
    * shingle — the write-once cost that makes the O(n²)-ish candidate
    * self-join shuffle-free forever after (SURVEY §7.9). A 100 TB
    * corpus's shingle index is re-joined on every dedup run and every
    * incremental ingest; bucketing moves the exchange from every run
    * to the one write. */
  def writeShingleIndex(docs: DataFrame, table: String, k: Int, buckets: Int): Unit =
    docShingles(docs, k).write.mode("overwrite")
      .bucketBy(buckets, "shingle").sortBy("shingle").saveAsTable(table)

  /** [[ngramJaccardPairs]] over a pre-bucketed shingle index written by
    * [[writeShingleIndex]]: the shingle-intersection self-join reads
    * both sides already hash-distributed on the join key, so the plan
    * has NO Exchange below the join (spec-asserted) — the only
    * remaining shuffles are the small per-pair and per-doc aggregates. */
  def ngramJaccardPairsIndexed(spark: SparkSession, table: String, num: Int, den: Int,
      maxDf: Int = 100): DataFrame = {
    // The df-cap groupBy reads the bucketed table already distributed
    // by shingle, so even the cap costs no Exchange here.
    val sh = capShingleDf(spark.table(table), maxDf)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = capShingleDf(spark.table(table), maxDf)
      .select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = capShingleDf(spark.table(table), maxDf)
      .select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val inter = shA.join(shB,
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .filter(col("n_inter") * den >= col("n_union") * num)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        round(col("n_inter").cast(DoubleType) / col("n_union"), 4).as("jaccard"))
  }

  /** MinHash signatures: for each of `numHashes` seeded murmur3 hash
    * functions, the min hash over the doc's shingles. Computed by the
    * codegen'd [[org.apache.spark.sql.graft.MinHashSigExpr]] — a
    * map-only projection, no shuffle: the declarative explode→groupBy
    * formulation ([[minhashSignaturesShuffle]]) moves every (doc,
    * shingle) pair through an exchange, which at 100 TB costs more
    * than the hashing itself. Bit-identical outputs (spec-proven). */
  def minhashSignatures(docs: DataFrame, k: Int, numHashes: Int): DataFrame =
    docs.select(col("doc_id"),
        org.apache.spark.sql.graft.MinHashSigFunctions
          .minhashSig(col("text"), k, numHashes).as("signature"))
      .filter(col("signature").isNotNull)

  /** Declarative reference formulation of [[minhashSignatures]] (one
    * shuffle on doc_id). Kept as the parity oracle for the codegen
    * expression — and as the fallback shape if the corpus ever moves
    * to pre-exploded shingle tables. */
  def minhashSignaturesShuffle(docs: DataFrame, k: Int, numHashes: Int): DataFrame = {
    val sh = docShingles(docs, k)
    val mins = (0 until numHashes).map(i => min(hash(col("shingle"), lit(i))).as(s"h$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** LSH banding: split the signature into `bands` contiguous bands
    * and hash each band → (band_idx, band_hash) bucket keys. Docs
    * sharing any bucket are near-dup candidates; candidate generation
    * is an equi-join on the bucket key — shuffle, not cross-join.
    * Band hashes come straight from `slice`+`hash` on the in-row
    * signature array: no explode → re-aggregate round trip. */
  def lshBuckets(signatures: DataFrame, bands: Int, numHashes: Int): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val r = numHashes / bands
    val bandHashes = array((0 until bands).map(j =>
      hash(slice(col("signature"), j * r + 1, r), lit(j))): _*)
    signatures.select(col("doc_id"),
      posexplode(bandHashes).as(Seq("band", "band_hash")))
  }

  /** Candidate near-dup pairs from LSH buckets. Sides are given
    * disjoint column names up front — see ngramJaccardPairs on why a
    * same-lineage self-join must be avoided. */
  def lshCandidates(buckets: DataFrame): DataFrame = {
    val a = buckets.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
    val b = buckets.select(col("doc_id").as("doc_b"),
      col("band").as("band_b"), col("band_hash").as("band_hash_b"))
    a.join(b, col("band") === col("band_b") && col("band_hash") === col("band_hash_b")
        && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Jaccard ESTIMATE for candidate pairs straight from the MinHash
    * signatures — the middle tier of the MinHash pipeline (bucket →
    * estimate → exact-verify): E[matching positions / numHashes] =
    * true Jaccard, so candidates can be ranked/thresholded WITHOUT
    * touching the documents again; only survivors pay the exact
    * shingle intersection. Position-match counting is one zip over
    * the two in-row signature arrays per pair (codegen'd HOF-free
    * via aggregate on zip_with? — the arrays are small (numHashes),
    * so the typed zip inside the join projection is the cheap part;
    * the join itself is by id, an equi-join). */
  def minhashJaccardEstimate(sigs: DataFrame, candidates: DataFrame): DataFrame = {
    val a = sigs.select(col("doc_id").as("doc_a"), col("signature").as("sig_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("signature").as("sig_b"))
    candidates.join(a, "doc_a").join(b, "doc_b")
      .withColumn("n_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), p => p))
          .cast(LongType))
      .withColumn("est_jaccard",
        round(col("n_match").cast(DoubleType) / size(col("sig_a")), 4))
      .select("doc_a", "doc_b", "n_match", "est_jaccard")
  }

  /** JVM-local twin of `minhashSignatures` → `lshBuckets` for ONE
    * document: returns its (band, band_hash) bucket keys. Bit-exact
    * with the batch path (same murmur3 evaluation order as Spark's
    * `hash(shingle, lit(i))` and `hash(slice(sig,…), lit(j))`), so a
    * streaming pipeline using these keys lands documents in the SAME
    * buckets as a batch backfill over the same corpus — verified by
    * spec. Used per-row inside a narrow flatMap: no shuffle, no state.
    */
  def minhashBandKeys(text: String, k: Int, numHashes: Int, bands: Int): Array[(Int, Int)] = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val r = numHashes / bands
    val sig = org.apache.spark.sql.graft.MinHashSig.signature(text, k, numHashes)
    if (sig == null) return Array.empty
    Array.tabulate(bands) { j =>
      var h = 42
      var t = j * r
      while (t < (j + 1) * r) { h = Murmur3_x86_32.hashInt(sig(t), h); t += 1 }
      (j, Murmur3_x86_32.hashInt(j, h))
    }
  }

  /** Exact all-pairs embedding-cosine near-dup pairs — blocked kernel.
    *
    * The declarative formulation (`a.join(b, vec_a < vec_b)`) plans as
    * a BroadcastNestedLoopJoin that pays per-candidate row machinery
    * (UnsafeRow copy, condition eval, projection) for all n² ordered
    * pairs before the threshold filter drops ~all of them. This kernel
    * keeps the identical distribution model — one side partitioned, the
    * other broadcast, exactly what BNLJ does — but runs the inner loop
    * over primitive float arrays with norms precomputed once per
    * vector, so the per-pair cost is one fused dot product and a
    * comparison. ~10× on the bench; bit-identical output (spec-proven):
    * same left-to-right double accumulation as the codegen'd
    * FloatVecDot, same HALF_UP rounding as `round(c, 4)`.
    *
    * Scale posture: brute-force all-pairs is inherently O(n²) — the
    * production near-dup path is [[embCosPairsBucketed]] (hyperplane
    * LSH candidates + exact cosine, never broadcasts the corpus) or
    * MinHash/IVF; this is the exact baseline, and the broadcast side
    * must fit in executor memory (dim-64 floats: ~270 MB per million
    * vectors). The `maxBroadcastRows` guard makes misuse fail fast
    * instead of OOMing the driver mid-collect.
    */
  def embCosPairs(emb: DataFrame, threshold: Double,
      maxBroadcastRows: Long = 1L << 20): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
    // Size gate BEFORE materializing: one count job (a metadata-cheap
    // scan) versus an unconditional full-table collect that would OOM
    // the driver on any real corpus.
    val n = rows.count()
    require(n <= maxBroadcastRows,
      s"embCosPairs is the exact all-pairs baseline: corpus has $n vectors > " +
        s"broadcast cap $maxBroadcastRows. Use embCosPairsBucketed (LSH candidate " +
        "generation + exact cosine on candidates) for corpora past the cap.")
    // The broadcast side: ids sorted so each task scans a contiguous
    // array. collect() here is the broadcast materialization itself
    // (what broadcast() does internally), not a driver-side compute loop.
    val corpus = rows.collect().sortBy(_._1)
    val ids = corpus.map(_._1)
    val vecs = corpus.map(_._2)
    val norms = vecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    rows.mapPartitions { it =>
      val (bIds, bVecs, bNorms) = bc.value
      it.flatMap { case (idA, embA) =>
        var na = 0.0
        var ni = 0
        while (ni < embA.length) { na += embA(ni).toDouble * embA(ni).toDouble; ni += 1 }
        val normA = math.sqrt(na)
        // first index with id > idA (ids are sorted, distinct)
        var lo = java.util.Arrays.binarySearch(bIds, idA)
        lo = if (lo >= 0) lo + 1 else -lo - 1
        (lo until bIds.length).iterator.flatMap { j =>
          val vb = bVecs(j)
          var d = 0.0; var i = 0
          while (i < embA.length) { d += embA(i).toDouble * vb(i).toDouble; i += 1 }
          val cos = BigDecimal(d / (normA * bNorms(j)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (cos >= threshold) Some((idA, bIds(j), cos)) else None
        }
      }
    }.toDF("vec_a", "vec_b", "cos")
  }

  /** Scale path for embedding-cosine near-dup: random-hyperplane LSH
    * banding generates candidate pairs through an equi-join on band
    * keys, then ONLY candidates pay an exact cosine — the corpus is
    * never broadcast, never collected, never cross-joined.
    *
    * `planes` sign bits per vector (deterministic hyperplanes — see
    * [[Similarity.lshSignature]]) are sliced into `bands` contiguous
    * bands; two vectors are candidates if ANY band matches (the
    * classic OR-of-ANDs: per-band match probability is
    * (1 − θ/π)^(planes/bands), so recall rises steeply with cosine —
    * near-dups at production thresholds ~0.95 are caught with
    * near-certainty while distant pairs rarely collide). Approximate
    * by construction: a true pair whose every band misses is lost —
    * recall vs [[embCosPairs]] is spec-measured.
    *
    * Shuffle shape at 100 TB: band keys are a narrow projection;
    * candidates meet through one equi-join on (band, band_hash);
    * exact cosine re-joins the two (id → vector) sides by key. Every
    * join is an equi-join with map-side-combinable inputs. */
  /** (id, band, band_hash) keys of the banded hyperplane signature —
    * band j = bits [j*r, (j+1)*r) of the packed signature. Public so
    * the streaming twin's bit-exactness is spec-checkable against
    * [[Similarity.hyperplaneBandKeys]] (the JVM kernel
    * streaming.StreamOps.embDedup keys its state by). */
  def embBandKeys(emb: DataFrame, planes: Int, bands: Int,
      idName: String = "vec_id", bandName: String = "band", hashName: String = "band_hash"): DataFrame = {
    require(planes % bands == 0, s"planes=$planes not divisible by bands=$bands")
    require(planes <= 63, "signature is packed into one long")
    val r = planes / bands
    Similarity.lshSignature(emb, planes)
      .select(col("vec_id").as(idName),
        posexplode(array((0 until bands).map(j =>
          struct(lit(j).as("b"),
            shiftright(col("bucket"), j * r).bitwiseAND(lit((1L << r) - 1)).as("h"))): _*))
          .as(Seq("__pos", "__bk")))
      .select(col(idName), col("__bk.b").as(bandName), col("__bk.h").as(hashName))
  }

  def embCosPairsBucketed(emb: DataFrame, threshold: Double,
      planes: Int = 16, bands: Int = 4): DataFrame = {
    // Sides built independently: a same-lineage self-join degrades to
    // a nested loop (see ngramJaccardPairs).
    val aK = embBandKeys(emb, planes, bands, "vec_a", "band_a", "hash_a")
    val bK = embBandKeys(emb, planes, bands, "vec_b", "band_b", "hash_b")
    val cands = aK.join(bK,
        col("band_a") === col("band_b") && col("hash_a") === col("hash_b")
          && col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val ea = Similarity.withNorm(emb).select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val eb = Similarity.withNorm(emb).select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("norm").as("norm_b"))
    cands.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Band bits sized to the CORPUS: bits/band = ⌈log₂(n / targetBucket)⌉
    * clamped to [4, 15], so expected bucket occupancy stays ~targetBucket
    * and candidate pairs grow LINEARLY with n. Fixed band bits are the
    * classic LSH scaling bug this repo's own sf1 checkpoint caught:
    * 4-bit bands mean 16 buckets per band at ANY corpus size, so
    * candidates grow as n²/16 — the 10× synthetic corpus read 131×.
    * The trade is recall at LOW thresholds (P(band match) =
    * (1−θ/π)^bits falls as bits rise — fundamental LSH: finer buckets
    * distinguish more, agree less); near-dup-grade pairs (cos ≳ 0.9)
    * stay caught because their per-bit agreement is ~0.86+. The 15-bit
    * clamp is the packed-long ceiling (bands·bits ≤ 63) — past
    * n ≈ targetBucket·2¹⁵ per band, buckets grow again; at that scale
    * route through [[Similarity.ivfTopKAuto]]'s cell structure
    * instead. */
  def autoBandBits(n: Long, targetBucket: Long = 32L): Int = {
    val needed = math.ceil(math.log(math.max(2L, n / math.max(1L, targetBucket))
      .toDouble) / math.log(2.0)).toInt
    math.min(15, math.max(4, needed))
  }

  /** [[embCosPairsBucketed]] with corpus-sized band bits (one count to
    * size the buckets — metadata-cheap next to the signature pass). */
  def embCosPairsBucketedAuto(emb: DataFrame, threshold: Double,
      bands: Int = 4, targetBucket: Long = 32L): DataFrame =
    embCosPairsBucketed(emb, threshold,
      planes = bands * autoBandBits(emb.count(), targetBucket), bands = bands)

  /** Declarative reference formulation of [[embCosPairs]] (BNLJ over
    * the codegen'd vector expressions). Kept as the parity oracle. */
  def embCosPairsDeclarative(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      l2norm(col("embedding")).as("norm_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      l2norm(col("embedding")).as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS (connected
    * components) — the last step of a real dedup pipeline: pairs say
    * "A≈B, B≈C", the pipeline needs "keep one of {A,B,C}". Component
    * id = the smallest doc_id in the component, so the cluster id IS
    * the canonical survivor.
    *
    * Distributed min-label propagation WITH pointer jumping: labels
    * seed directly with min(self, neighbors) (the first propagation
    * round costs only a groupBy, no join); each round then takes
    * (a) the min over neighbor labels — one equi-join + aggregate on
    * the edge list — and (b) the label OF the label (pointer jump, a
    * second small join on the label frame), which doubles the distance
    * information travels per round. Converged when a round changes
    * nothing. No per-node state beyond the label frame, which is
    * `localCheckpoint`ed per round (truncates the iterative lineage
    * that would otherwise grow the plan exponentially; at 100 TB this
    * would be a table write, same shape). Rounds needed ≈ log₂(graph
    * diameter) + 1 instead of diameter — near-dup graphs are short
    * chains/cliques, so this lands at 1-2 joined rounds in practice;
    * `maxIter` is a backstop (supports diameter ~2^maxIter),
    * convergence is checked with one count per round over the
    * just-checkpointed frame.
    *
    * Output: (doc_id, comp) for every doc that appears in `pairs`.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // undirected: both directions of every edge. pairs are unique with
    // doc_a < doc_b, so the two directions cannot collide — no distinct
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .materialize()
    // seed = min(self, neighbors): exactly what round 1 of plain
    // propagation would compute from identity labels, for one groupBy
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("doc_id"), least(col("src"), col("nmin")).as("comp"))
      .materialize()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (a) neighbor labels: for each edge (src, dst), dst's current label
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("comp", "n_comp"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("n_comp")).as("nmin"))
      val stepped = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp1"))
      // (b) pointer jump: follow comp1 to ITS label — labels always
      // point at a member of the same component, so the jump stays in
      // component and never increases (labels only shrink)
      val updated = stepped
        .join(labels.select(col("doc_id").as("comp1"), col("comp").as("parent")),
          Seq("comp1"), "left")
        .select(col("doc_id"), col("old"),
          least(col("comp1"), coalesce(col("parent"), col("comp1"))).as("comp"))
        // carry the previous label through the checkpoint so the
        // convergence check is one scan of the materialized frame
        .materialize()
      val changed = updated.filter(col("comp") =!= col("old")).limit(1).count()
      labels = updated.drop("old")
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Canonical-survivor selection — the artifact a dedup pipeline
    * actually emits: near-dup clusters ([[dupClusters]]) collapse to
    * ONE kept doc each, the highest-quality member (longest text,
    * ties → lowest doc_id); docs in no cluster keep themselves.
    * Output: (doc_id, comp, quality, keep) for EVERY doc — the keep
    * column is the dedup filter, comp is the survivor's audit trail.
    * Scale shape: the cluster labels join back on doc_id (equi-join)
    * and the winner is a per-comp row_number over bounded groups —
    * no step touches more than |docs| + |cluster members| rows. */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = dupClusters(pairs)
    val scored = docs.select(col("doc_id"), length(col("text")).cast(LongType).as("quality"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("comp").orderBy(col("quality").desc, col("doc_id"))
    scored.withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "comp", "quality", "keep")
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sum ±1 weighted by
    * token-hash bit, sign → bit. Implemented as 64 codegen'd
    * conditional sums — one aggregation pass, no UDF. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** Near-dup PAIRS from 64-bit similarity hashes (SimHash, image
    * block-hash, …) with Hamming distance ≤ `maxDist` — banded exactly
    * like MinHash-LSH: the 64 bits split into `bands` contiguous
    * slices, and by pigeonhole two hashes within distance d < bands
    * MUST agree on at least one full band, so candidates meet through
    * an equi-join on (band, band_bits) — never an all-pairs scan; the
    * codegen'd `bit_count(a XOR b)` filter then keeps true pairs. With
    * bands > maxDist the recall is EXACT (no pigeonhole miss), which a
    * spec proves; fewer bands trade recall for fan-out like any LSH. */
  def hammingNearDup(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val r = 64 / bands
    def side(id: String, h: String, b: String, bb: String): DataFrame =
      hashes.select(col(idCol).as(id), col(hashCol).as(h))
        .select(col(id), col(h),
          posexplode(array((0 until bands).map(j =>
            shiftrightunsigned(col(h), j * r)
              .bitwiseAND(lit((1L << r) - 1))): _*)).as(Seq(b, bb)))
    val a = side("id_a", "hash_a", "band_a", "bits_a")
    val b = side("id_b", "hash_b", "band_b", "bits_b")
    a.join(b, col("band_a") === col("band_b") && col("bits_a") === col("bits_b")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("hash_a").bitwiseXOR(col("hash_b"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Edit-distance near-dup pairs over the DISTINCT values of a string
    * column: (value_a, value_b, dist) with `levenshtein ≤ maxDist` and
    * value_a < value_b. Two scale decisions:
    *  - distinct-first: repeated values (product names, titles, spam
    *    templates) collapse before any pairing, so the pair space is
    *    bounded by the VOCABULARY, not the row count;
    *  - length blocking via the binned range join: |len(a) − len(b)| >
    *    maxDist implies distance > maxDist, so candidates come from
    *    `RangeJoins.pointInInterval` on length (an equi-join on length
    *    bins — never a full cross join), and the codegen'd
    *    `levenshtein` runs only inside a block.
    * Its bounded-alphabet worst case (everything the same length) is
    * quadratic in DISTINCT values — the inherent cost of exact edit
    * distance; MinHash/SimHash remain the unbounded-corpus paths. */
  def editDistancePairs(df: DataFrame, column: String, maxDist: Int): DataFrame = {
    val names = df.select(col(column).as("name")).filter(col("name").isNotNull).distinct()
    val points = names.select(col("name").as("name_a"), length(col("name")).as("la"))
    val intervals = names.select(col("name").as("name_b"),
      (length(col("name")) - maxDist).as("lo"), (length(col("name")) + maxDist).as("hi"))
    RangeJoins.pointInInterval(points, "la", intervals, "lo", "hi",
        binWidth = maxDist + 1L)
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> { (s, d) =>
      exactGroups(Tables.documents(s, d)).orderBy("text_hash")
    },

    "dedup_minhash_recall" -> { (s, d) =>
      // HASH-CHECKED quality gate for the MinHash/LSH near-dup path
      // (dedup_minhash itself is rows-only — buckets are murmur3-
      // internal): every sufficiently long doc among the first 200
      // gets a PLANTED near-duplicate (a short appended tail →
      // 3-shingle Jaccard ≈ 0.85+, squarely in the 8-band×4-row
      // catch zone), re-id'd far above the corpus. The banded
      // candidate join must recover ≥70% of the planted pairs —
      // reduced to one (n_planted, recall_ok) row whose boolean the
      // DuckDB oracle asserts, so a silently broken hash family or
      // banding bug fails CORRECTNESS, not just a spec.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val off = 1000000000L
      val planted = docs.filter(col("doc_id") < 200 && length(col("text")) >= 200)
      val dups = planted.select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(" planted near duplicate tail marker")).as("text"))
      val corpus = docs.unionByName(dups)
      val cands = lshCandidates(lshBuckets(minhashSignatures(corpus, 3, 32), 8, 32))
      val hits = cands.filter(col("doc_b") === col("doc_a") + off)
        .select(col("doc_a")).distinct()
        .join(planted.select("doc_id"), col("doc_a") === col("doc_id"), "left_semi")
      planted.agg(count(lit(1)).as("n_planted")).crossJoin(
        hits.agg(count(lit(1)).as("__h")))
        .select(col("n_planted"),
          (col("__h").cast("double") / col("n_planted") >= 0.7).as("recall_ok"))
    },

    "dedup_simhash_recall" -> { (s, d) =>
      // HASH-CHECKED planted-recall gate for the SimHash→banded-
      // Hamming path: long docs among the first 200 get appended-tail
      // near-duplicates; a 5-token tail on a 70+-token doc shifts few
      // weighted bit sums, so the pair must sit within Hamming
      // distance 3 — where bands=4 > maxDist makes the join's recall
      // EXACT by pigeonhole, leaving the HASH's locality as the only
      // thing under test. ≥70% of planted pairs must surface.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val off = 1000000000L
      val planted = docs.filter(col("doc_id") < 200 && length(col("text")) >= 500)
      val dups = planted.select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(" planted near duplicate tail marker")).as("text"))
      val pairs = hammingNearDup(simhash(docs.unionByName(dups)),
        "doc_id", "simhash", maxDist = 3, bands = 4)
      val hits = pairs.filter(col("id_b") === col("id_a") + off)
        .select(col("id_a")).distinct()
        .join(planted.select("doc_id"), col("id_a") === col("doc_id"), "left_semi")
      planted.agg(count(lit(1)).as("n_planted")).crossJoin(
        hits.agg(count(lit(1)).as("__h")))
        .select(col("n_planted"),
          (col("__h").cast("double") / col("n_planted") >= 0.7).as("recall_ok"))
    },

    "dedup_emblsh_recall" -> { (s, d) =>
      // HASH-CHECKED quality gate for the banded hyperplane LSH path
      // (dedup_embcos_lsh is rows-only): the first 50 vectors get
      // planted ~0.999-cosine twins far above the id range; the
      // auto-banded candidate join + exact-cosine filter at 0.9 must
      // recover ≥70% of the planted pairs. Same one-row boolean shape
      // as the ANN recall gates.
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val off = 1000000000L
      val planted = emb.filter(col("vec_id") < 50)
      val twins = planted.select((col("vec_id") + off).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => (a * lit(0.99f) + lit(0.02f) * b).cast("float")).as("embedding"))
      val pairs = embCosPairsBucketedAuto(emb.unionByName(twins), 0.9)
      val hits = pairs.filter(col("vec_b") === col("vec_a") + off)
        .select(col("vec_a")).distinct()
        .join(planted.select("vec_id"), col("vec_a") === col("vec_id"), "left_semi")
      planted.agg(count(lit(1)).as("n_planted")).crossJoin(
        hits.agg(count(lit(1)).as("__h")))
        .select(col("n_planted"),
          (col("__h").cast("double") / col("n_planted") >= 0.7).as("recall_ok"))
    },

    "dedup_ngram" -> { (s, d) =>
      // Jaccard ≥ 1/2 over distinct word 3-shingles. The overlap stats
      // are SHARED with dedup_containment and dedup_clusters (one
      // candidate self-join feeds all three measures).
      jaccardFromStats(pairOverlapStatsShared(Tables.documents(s, d), d, 3), 1, 2)
        .orderBy("doc_a", "doc_b")
    },

    "dedup_minhash" -> { (s, d) =>
      // Rows-only oracle (hash family is Spark murmur3). 32 hashes,
      // 8 bands of 4 → candidates at jaccard ≳ 0.5, each carrying its
      // signature-based Jaccard estimate (the rank/threshold tier
      // between bucketing and exact verification).
      val sigs = minhashSignatures(Tables.documents(s, d), 3, 32)
      minhashJaccardEstimate(sigs, lshCandidates(lshBuckets(sigs, 8, 32)))
        .orderBy("doc_a", "doc_b")
    },

    "dedup_simhash" -> { (s, d) =>
      // Rows-only oracle (xxhash64 is Spark-specific).
      simhash(Tables.documents(s, d)).orderBy("doc_id")
    },

    "dedup_embcos" -> { (s, d) =>
      // Embedding-cosine near-dup pairs — the gated O(n²) EXACT
      // baseline. The synthetic corpus has no true duplicates (max
      // pairwise cos ≈ 0.51), so the threshold is set to exercise the
      // full path with non-empty output; the production threshold
      // would be ~0.95. BENCH INPUT IS CAPPED: a deterministic
      // md5-ordered top-2000 sample (TakeOrdered, scale-safe) bounds
      // the quadratic demo so the sf1 artifact measures plans rather
      // than the anti-pattern this library exists to avoid — at the
      // correctness gate's scales (≤2000 vectors) the sample IS the
      // full table, so gate outputs are unchanged. `dedup_embcos_lsh`
      // remains the full-corpus scale entry.
      val sample = Tables.embeddings(s, d)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(2000)
      embCosPairs(sample, 0.45).orderBy("vec_a", "vec_b")
    },

    "dedup_clusters" -> { (s, d) =>
      // Near-dup pairs → duplicate clusters (connected components);
      // cluster id = smallest member = the canonical survivor. Oracle
      // is a DuckDB recursive-CTE transitive closure over the same
      // pair set. Pair stats shared with dedup_ngram/dedup_containment.
      dupClusters(jaccardFromStats(
          pairOverlapStatsShared(Tables.documents(s, d), d, 3), 1, 2))
        .orderBy("doc_id")
    },

    "dedup_canonical" -> { (s, d) =>
      // Per-cluster survivor selection — the keep-list a dedup
      // pipeline emits: clusters from the SHARED overlap-stats pass
      // (one candidate join feeds ngram/containment/clusters/canonical),
      // keep the longest member (ties → lowest id), singletons keep
      // themselves. Oracle: recursive-CTE closure + a window.
      keepBestPerCluster(Tables.documents(s, d),
        jaccardFromStats(pairOverlapStatsShared(Tables.documents(s, d), d, 3), 1, 2))
        .orderBy("doc_id")
    },

    "pipe_dedup_sample" -> { (s, d) =>
      // Dedup-aware sampling — the order a real corpus release runs:
      // canonical selection FIRST (one survivor per near-dup cluster,
      // from the shared overlap-stats pass), THEN the deterministic
      // portable-md5 sample (~60%) over survivors only — so a
      // duplicated document can never buy itself extra sampling mass,
      // and the sample stays append-stable and engine-reproducible.
      // Reported as the per-lang release profile.
      val docs = Tables.documents(s, d)
      val kept = keepBestPerCluster(docs,
        jaccardFromStats(pairOverlapStatsShared(docs, d, 3), 1, 2))
        .filter(col("keep"))
      val sampled = kept.filter(
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 4), 16, 10)
          .cast(LongType) < 39322)
      docs.join(sampled.select("doc_id"), Seq("doc_id"), "left_semi")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    },

    "dedup_editdist" -> { (s, d) =>
      // Typo-level near-dups among distinct part names: vocabulary-
      // bounded pair space + length blocking (see editDistancePairs).
      editDistancePairs(Tables.part(s, d), "p_name", 2)
        .orderBy("name_a", "name_b")
    },

    "dedup_embcos_lsh" -> { (s, d) =>
      // Rows-only oracle (hyperplane signatures are Spark/JVM-side).
      // The scale path behind embCosPairs' broadcast cap: banded
      // hyperplane LSH candidates, exact cosine on candidates only.
      // Band bits size to the corpus (autoBandBits) so candidate
      // pairs stay linear in n — the sf1 scaling checkpoint read the
      // old fixed-16-plane version at 131×.
      embCosPairsBucketedAuto(Tables.embeddings(s, d), 0.45)
        .orderBy("vec_a", "vec_b")
    },

    "dedup_hamming" -> { (s, d) =>
      // Rows-only (xxhash64-based simhash): SimHash near-dup PAIRS
      // via the banded Hamming equi-join — bands=4 > maxDist=3, so
      // recall is exact by pigeonhole (spec-proven).
      hammingNearDup(simhash(Tables.documents(s, d)), "doc_id", "simhash",
        maxDist = 3, bands = 4)
        .orderBy("id_a", "id_b")
    },

    "dedup_containment" -> { (s, d) =>
      // One-sided containment ≥ 2/3 over word 3-shingles: catches the
      // quoted-excerpt/subset pairs whose Jaccard stays under the
      // dedup_ngram threshold because the longer doc inflates the
      // union. Pair stats shared with dedup_ngram/dedup_clusters.
      containmentFromStats(pairOverlapStatsShared(Tables.documents(s, d), d, 3), 2, 3)
        .orderBy("doc_a", "doc_b")
    },

    "dedup_substring" -> { (s, d) =>
      // Cross-doc EXACT substring duplication: pairs sharing ≥ 1
      // sampled 60-char window (stride 4, df-capped equi-join) with
      // the distinct-shared-window count — catches verbatim copied
      // spans whose word-shingle Jaccard the surrounding text dilutes.
      // Hash-checked: the window set is plain substr arithmetic both
      // engines reproduce exactly.
      substringDupPairs(Tables.documents(s, d), 60, 4)
        .orderBy("doc_a", "doc_b")
    }
  )

  /** Shared oracle prefix for the canonical-selection family: shingle
    * universe → df-capped candidate pairs → recursive closure →
    * per-doc component (the dedup_canonical chain, verbatim). */
  private val canonicalOracleCte =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id, s FROM toks,
      |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
      |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |      ELSE [] END)) AS u(s)),
      |sh AS (
      |  SELECT doc_id, s FROM sh0
      |  QUALIFY COUNT(*) OVER (PARTITION BY s) <= 100),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM inter
      |    JOIN sizes sa ON sa.doc_id = doc_a
      |    JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE n_inter * 2 >= (sa.n_sh + sb.n_sh - n_inter) * 1),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |reach(n, m) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src),
      |comp AS (SELECT n AS doc_id, MIN(m) AS comp FROM reach GROUP BY n)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the planted-recall gates' one-row shape is fully DuckDB-
    // predictable: n_planted from the same filter over the table,
    // recall_ok must read TRUE — a broken hash family or banding bug
    // hash-fails CORRECTNESS even though buckets are Spark-internal
    "dedup_minhash_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_planted, TRUE AS recall_ok
        |FROM documents WHERE doc_id < 200 AND length(text) >= 200""".stripMargin,

    "dedup_emblsh_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_planted, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 50""".stripMargin,

    "dedup_simhash_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_planted, TRUE AS recall_ok
        |FROM documents WHERE doc_id < 200 AND length(text) >= 500""".stripMargin,

    "dedup_editdist" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    "dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, s FROM toks,
        |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS u(s)),
        |sh AS (
        |  SELECT doc_id, s FROM sh0
        |  QUALIFY COUNT(*) OVER (PARTITION BY s) <= 100),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_inter, (sa.n_sh + sb.n_sh - n_inter) AS n_union,
        |  ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
        |FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE n_inter * 2 >= (sa.n_sh + sb.n_sh - n_inter) * 1
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, s FROM toks,
        |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS u(s)),
        |sh AS (
        |  SELECT doc_id, s FROM sh0
        |  QUALIFY COUNT(*) OVER (PARTITION BY s) <= 100),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |    JOIN sizes sa ON sa.doc_id = doc_a
        |    JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE n_inter * 2 >= (sa.n_sh + sb.n_sh - n_inter) * 1),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(n, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src)
        |SELECT n AS doc_id, MIN(m) AS comp FROM reach
        |GROUP BY n ORDER BY doc_id""".stripMargin,

    "dedup_canonical" ->
      s"""$canonicalOracleCte
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS comp,
        |  LENGTH(d.text) AS quality,
        |  (ROW_NUMBER() OVER (PARTITION BY COALESCE(c.comp, d.doc_id)
        |     ORDER BY LENGTH(d.text) DESC, d.doc_id) = 1) AS keep
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "pipe_dedup_sample" ->
      s"""$canonicalOracleCte,
        |keepers AS (
        |  SELECT d.doc_id, d.lang, d.n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY COALESCE(c.comp, d.doc_id)
        |      ORDER BY LENGTH(d.text) DESC, d.doc_id) AS rn
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM keepers
        |WHERE rn = 1
        |  AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) < 39322
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, s FROM toks,
        |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS u(s)),
        |sh AS (
        |  SELECT doc_id, s FROM sh0
        |  QUALIFY COUNT(*) OVER (PARTITION BY s) <= 100),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_inter, LEAST(sa.n_sh, sb.n_sh) AS n_min,
        |  ROUND(CAST(n_inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 4) AS containment
        |FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE n_inter * 3 >= LEAST(sa.n_sh, sb.n_sh) * 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embcos" ->
      """WITH s AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  QUALIFY row_number()
        |    OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 2000)
        |SELECT vec_a, vec_b, cos FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    ROUND(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM s a JOIN s b ON a.vec_id < b.vec_id) t
        |WHERE cos >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,

    "dedup_substring" ->
      """WITH n AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
        |  FROM documents),
        |w0 AS (
        |  SELECT DISTINCT doc_id, substr(nt, CAST(i AS INT), 60) AS win
        |  FROM n, UNNEST(range(1, length(nt) - 58, 4)) AS u(i)
        |  WHERE length(nt) >= 60),
        |w AS (
        |  SELECT doc_id, win FROM w0
        |  QUALIFY COUNT(*) OVER (PARTITION BY win) <= 100)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        |FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin
  )
}
