package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.Fx._
import graft.sources.Tables

/** Text analysis for training-data pipelines (SURVEY §2 group 5):
  * token/char stats, quality scoring, stopword-overlap language ID,
  * document fingerprinting. All single-pass narrow transforms over the
  * documents table — no shuffle except the langid argmax, which
  * shuffles 5 small score rows per doc (or none with the array-sort
  * variant used in the library path).
  */
/** A compact FROZEN bigram LM for ingest-time quality scoring: the
  * top unigrams/bigrams of a reference corpus by count, plus the FULL
  * corpus totals as normalization constants. Bounded state by
  * construction (the caps are the contract), so the whole model
  * broadcasts and scoring is a narrow per-row map — no shuffle, no
  * per-batch state growth. Scoring is Jelinek–Mercer interpolated
  * like [[TextAnalysis.bigramPerplexity]], but add-one-closed over
  * the reference vocab: an unseen token reads `(0+1)/(T+V)`, so OOV
  * text scores HIGH perplexity instead of breaking the model — the
  * frozen-model contract CCNet's KenLM filter has. */
case class CompactBigramLm(
    uni: Map[String, Long],
    big: Map[(String, String), Long],
    totalTokens: Long,
    vocabSize: Long,
    lambda: Double) {

  /** (n_bigrams, nll, ppl) of one normalized token sequence; None
    * when there are fewer than two tokens (no evidence to score). */
  def score(toks: Array[String]): Option[(Long, Double, Double)] = {
    if (toks.length < 2) return None
    val norm = (totalTokens + vocabSize).toDouble
    var s = 0.0
    var i = 0
    while (i < toks.length - 1) {
      val cw = uni.getOrElse(toks(i), 0L)
      val bigTerm =
        if (cw > 0L) lambda * big.getOrElse((toks(i), toks(i + 1)), 0L).toDouble / cw
        else 0.0
      val uniTerm = (1.0 - lambda) * (uni.getOrElse(toks(i + 1), 0L) + 1.0) / norm
      s += math.log(bigTerm + uniTerm)
      i += 1
    }
    val n = toks.length - 1
    val nll = -s / n
    Some((n.toLong, nll, math.exp(nll)))
  }
}

object CompactBigramLm {
  /** JVM twin of [[graft.functions.Fx.tokens]]: regexp-collapse
    * whitespace, trim, lowercase, split on single spaces (limit -1 —
    * Spark's split keeps empty fields). */
  def normTokens(text: String): Array[String] =
    text.replaceAll("\\s+", " ").trim
      .toLowerCase(java.util.Locale.ROOT).split(" ", -1)
}

object TextAnalysis {

  /** Tiny per-language stopword lists — enough signal for an n-gram
    * heuristic language ID; deliberately ASCII-only so the oracle SQL
    * is byte-identical. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "en"),
    "zh" -> Seq("de", "le", "shi", "zai", "you", "wo", "ta", "men", "zhe", "na"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Per-doc token/char statistics. */
  def stats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      size(toks).cast(LongType).as("n_tokens"),
      round(length(regexp_replace(normText(col("text")), " ", "")).cast(DoubleType)
        / size(toks), 4).as("avg_tok_len"))
  }

  /** Quality signals: stopword/punct/digit/space ratios + a composite
    * score. Ratios are exact integer-length divisions rounded at the
    * boundary. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nChars = length(col("text"))
    val nStop = countIn(toks, stopwords("en"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[\\.,;:!\\?]", ""))
    val nDigit = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val nSpace = nChars - length(regexp_replace(col("text"), " ", ""))
    docs.select(
      col("doc_id"),
      round(nStop.cast(DoubleType) / nTok, 4).as("stopword_ratio"),
      round(nPunct.cast(DoubleType) / nChars, 4).as("punct_ratio"),
      round(nDigit.cast(DoubleType) / nChars, 4).as("digit_ratio"),
      round(nSpace.cast(DoubleType) / nChars, 4).as("space_ratio"),
      round(least(nTok.cast(DoubleType) / 100.0, lit(1.0))
        * (lit(1.0) - nDigit.cast(DoubleType) / nChars), 4).as("quality_score"))
  }

  /** Stopword-overlap language ID: hit count per candidate language,
    * argmax with deterministic (hits DESC, lang ASC) tie-break.
    *
    * Typed map, not a 5-language HOF projection: `filter`/`array_sort`
    * higher-order functions have no doGenCode, so the declarative
    * version interprets ~|langs|·|tokens| membership tests per row AND
    * re-inlines the tokenizer once per language — ~20× slower under
    * real execution. One narrow pass, no shuffle. */
  def langid(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sw: Seq[(String, Set[String])] =
      stopwords.toSeq.sortBy(_._1).map { case (l, ws) => (l, ws.toSet) }
    docs.select(col("doc_id").cast(LongType), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        val toks = text.trim.replaceAll("\\s+", " ")
          .toLowerCase(java.util.Locale.ROOT).split(" ")
        val (bestLang, bestHits) = sw
          .map { case (l, set) => (l, toks.count(set)) }
          .minBy { case (l, h) => (-h, l) }
        (id, lang, bestLang, bestHits.toLong)
      }
      .toDF("doc_id", "labeled_lang", "pred_lang", "hits")
  }

  /** PII-pattern scan — the pre-release redaction audit a corpus runs
    * before publishing/training: per doc, non-overlapping match counts
    * of email addresses, URLs, IPv4 literals, and long digit runs
    * (phone/account-number shaped). Patterns are RE2-safe (no
    * lookaround/backrefs) so Java regex and the DuckDB oracle scan
    * identically. One narrow codegen'd projection — at 100 TB this is
    * a map-only pass, typically fused with the quality gate's scan. */
  def piiScan(docs: DataFrame): DataFrame = {
    val t = col("text")
    val counts = docs.select(
      col("doc_id"),
      regexp_count(t, lit("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"))
        .cast(LongType).as("n_emails"),
      regexp_count(t, lit("https?://[^ ]+")).cast(LongType).as("n_urls"),
      regexp_count(t, lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"))
        .cast(LongType).as("n_ipv4"),
      regexp_count(t, lit("[0-9]{7,}")).cast(LongType).as("n_longnum"))
    counts.withColumn("has_pii",
      col("n_emails") + col("n_urls") + col("n_ipv4") + col("n_longnum") > 0)
  }

  /** PII REDACTION — the transform half [[piiScan]] only detects:
    * emails, URLs, IPv4s, and long digit runs replace with typed
    * placeholders, applied in one chained narrow projection (order
    * matters and is pinned: URLs first, or an email inside a URL
    * query string would split it; digit runs last so IPv4 octets are
    * already gone). Emits the redacted text's md5 (so an external
    * engine can verify the redaction byte-for-byte without shipping
    * the text) and the raw-text pattern hit count (an upper bound on
    * replacements when patterns nest). The GDPR-adjacent sibling
    * of SnapshotStore.deleteWhere/ChunkStore.redact: those erase
    * ROWS/payloads, this cleanses content kept in the corpus. */
  def anonymize(docs: DataFrame): DataFrame = {
    val urlP = "https?://[^ ]+"
    val emailP = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ipP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val numP = "[0-9]{7,}"
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), urlP, "<URL>"),
            emailP, "<EMAIL>"),
          ipP, "<IP>"),
        numP, "<NUM>")
    docs.select(col("doc_id"),
      (regexp_count(col("text"), lit(urlP)) + regexp_count(col("text"), lit(emailP))
        + regexp_count(col("text"), lit(ipP)) + regexp_count(col("text"), lit(numP)))
        .cast(LongType).as("n_redacted"),
      md5(redacted).as("redacted_md5"),
      length(redacted).cast(LongType).as("redacted_len"))
  }

  /** Flesch-style readability score per doc — the classic
    * surface-structure quality signal (sentence length × syllable
    * density) a corpus mixes with [[quality]]'s ratios: sentences are
    * terminator runs ([.!?]+, min 1 so fragments still score),
    * syllables are approximated as vowel-group runs (the standard
    * dependency-free heuristic). One narrow codegen'd projection —
    * every count is a regex count written token-identically in the
    * oracle; the float formula runs once per row at the boundary. */
  def readability(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nWords = size(toks).cast(DoubleType)
    val nSent = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast(DoubleType)
    val nSyll = greatest(regexp_count(lower(col("text")), lit("[aeiouy]+")), lit(1))
      .cast(DoubleType)
    docs.select(
      col("doc_id"),
      size(toks).cast(LongType).as("n_words"),
      nSent.cast(LongType).as("n_sentences"),
      nSyll.cast(LongType).as("n_syllables"),
      round(lit(206.835) - lit(1.015) * (nWords / nSent)
        - lit(84.6) * (nSyll / nWords), 4).as("flesch"))
  }

  /** BM25-ranked keyword search over the corpus (Robertson/Okapi, the
    * Lucene-default idf variant `ln(1 + (N − df + ½)/(df + ½))` which
    * is positive by construction). One generator pass feeds both the
    * doc-length aggregate and the query-term hits (the term filter
    * lands right behind the explode, so only matching occurrences
    * reach the (doc, term) count); df and the corpus stats are
    * term-count-sized one-row/broadcast frames; the final top-k plans
    * as TakeOrdered (bounded per-partition heaps — never a global
    * single-partition window). Ranking uses the ROUNDED score (ties →
    * doc_id) so the order is reproducible across engines. */
  def bm25Search(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 20): DataFrame = {
    // ONE tokenize pass for the whole search: aggregate occurrences by
    // (doc, query-term-or-null) — per doc that's ≤ |terms|+1 rows, so
    // doc lengths, term hits, df, and corpus stats all derive from a
    // frame corpus-times smaller than the token stream. Without this
    // the four consumers would each re-scan and re-tokenize the corpus
    // (the plan showed 4 Generate+Scan branches). localCheckpoint cuts
    // the shared lineage once, like the dedup pair-stats pass.
    val tokAgg = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      // projection barrier: explode must not re-evaluate tokens()
      .select(col("doc_id"), explode(col("tk")).as("tok"))
      .groupBy(col("doc_id"),
        when(col("tok").isin(terms: _*), col("tok")).as("qt"))
      .agg(count(lit(1)).as("n"))
      .materialize()
    val lens = tokAgg.groupBy("doc_id").agg(sum(col("n")).as("dl"))
    val stats = lens.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(col("dl").cast(DoubleType)).as("avgdl"))
    val hits = tokAgg.filter(col("qt").isNotNull)
      .select(col("doc_id"), col("qt").as("tok"), col("n").as("tf"))
    val dfreq = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    hits.join(lens, "doc_id").join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 4).as("bm25"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Persist the BM25 search artifact, SEGMENTED (the Lucene shape —
    * segments make the index incrementally maintainable without ever
    * rewriting old postings): each segment holds token postings
    * (token, doc_id, tf) PARTITIONED by a hash bucket of the token (so
    * a query's terms prune to ≤ |terms| partition directories per
    * segment), per-doc lengths, and the segment's tombstones (doc ids
    * this segment supersedes). [[writeBm25Index]] writes segment 0
    * with no tombstones; [[appendBm25Segment]] adds a delta. Built in
    * one tokenize pass over ONLY the docs handed in — the
    * index-once / query-many / maintain-by-delta shape. */
  def writeBm25Index(docs: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    appendBm25Segment(docs, spark.emptyDataset[Long].toDF("doc_id"), path, 0L, nBuckets)
  }

  /** Append a delta segment: postings + lengths for `docs` (the new or
    * REPLACEMENT versions), and `removed` (a `doc_id` frame) tombstones
    * for docs this delta deletes or supersedes (an updated doc appears
    * in BOTH — tombstoned for its old segments, re-posted here). Cost
    * is one tokenize pass over the DELTA only; no earlier segment is
    * read or rewritten. Tombstones stay a DataFrame end-to-end: a
    * bulk-delete CDC batch (tens of millions of ids at 100 TB) writes
    * executor→parquet without ever landing on the driver. */
  def appendBm25Segment(docs: DataFrame, removed: DataFrame, path: String,
      segId: Long, nBuckets: Int = 64): Unit = {
    val tok = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      // projection barrier: explode must not re-evaluate tokens()
      .select(col("doc_id"), explode(col("tk")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .materialize()
    tok
      .withColumn("tok_bucket", pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("tok_bucket")
      .parquet(s"$path/seg=$segId/postings")
    tok.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .write.mode("overwrite").parquet(s"$path/seg=$segId/lens")
    removed.select(col("doc_id").cast(LongType).as("doc_id"))
      .write.mode("overwrite").parquet(s"$path/seg=$segId/tombstones")
  }

  /** Maintain the segmented index straight from a SnapshotStore CDC
    * diff — the composition a versioned corpus needs: inserts and
    * updates re-post (reading only the delta rows), updates and
    * deletes tombstone their old versions. One tokenize pass over
    * |delta| docs; the store's CoW machinery decides what changed, the
    * index never rescans the corpus. Returns (nPosted, nTombstoned). */
  def updateBm25Index(store: graft.operators.SnapshotStore, fromVersion: Long,
      toVersion: Long, path: String, segId: Long,
      nBuckets: Int = 64): (Long, Long) = {
    val d = store.diff(fromVersion, toVersion).materialize()
    val posted = d.filter(col("change_type").isin("insert", "update"))
      .select(col("doc_id"), col("text"))
    val removed = d.filter(col("change_type").isin("update", "delete"))
      .select(col("doc_id"))
    appendBm25Segment(posted, removed, path, segId, nBuckets)
    (posted.count(), removed.count())
  }

  /** Compact a segmented index back to ONE segment (the Lucene merge):
    * resolve liveness exactly as [[bm25SearchFrom]] does, rewrite the
    * live postings/lens as segment `newSegId`, and drop the old
    * segment directories. Queries before and after are identical
    * (spec-proven); read amplification from accumulated deltas resets
    * to zero. */
  def compactBm25Index(spark: SparkSession, path: String, newSegId: Long): Unit = {
    import spark.implicits._
    val segs = bm25Segments(spark, path)
    require(!segs.contains(newSegId), s"segment $newSegId already exists")
    def perSeg(sub: String) = segs.map(g =>
      spark.read.schema(bm25SubSchema(sub)).parquet(s"$path/seg=$g/$sub")
        .withColumn("seg", lit(g)))
      .reduce(_.unionByName(_))
    val live = perSeg("lens").groupBy("doc_id")
      .agg(max(struct(col("seg"), col("dl"))).as("__last"))
      .select(col("doc_id"), col("__last.seg").as("seg"), col("__last.dl").as("dl"))
      .join(perSeg("tombstones").groupBy("doc_id").agg(max(col("seg")).as("__tseg")),
        Seq("doc_id"), "left")
      .filter(col("__tseg").isNull || col("seg") >= col("__tseg"))
      .select("doc_id", "seg", "dl")
      .materialize()
    perSeg("postings").join(live.select("doc_id", "seg"), Seq("doc_id", "seg"))
      .select("doc_id", "tok", "tf", "tok_bucket")
      .write.mode("overwrite").partitionBy("tok_bucket")
      .parquet(s"$path/seg=$newSegId/postings")
    live.select("doc_id", "dl")
      .write.mode("overwrite").parquet(s"$path/seg=$newSegId/lens")
    spark.emptyDataset[Long].toDF("doc_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/seg=$newSegId/tombstones")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    segs.foreach(g => fs.delete(new org.apache.hadoop.fs.Path(s"$path/seg=$g"), true))
  }

  /** HYBRID retrieval — BM25 keyword ranking fused with embedding
    * cosine ranking by Reciprocal Rank Fusion (Cormack et al., the
    * standard fusion behind most production RAG retrieval):
    * score(d) = Σ_lists 1/(k0 + rank_list(d)), summed over the lists
    * that retrieved d. Rank-based fusion needs NO score calibration
    * between BM25's unbounded sums and cosine's [−1, 1] — exactly why
    * RRF won; k0 = 60 is the paper's constant. Each branch retrieves
    * its own top-`poolK` pool (BM25 via [[bm25Search]], cosine via
    * [[Similarity.bruteForceTopK]] — swap in `ivfpqTopKFrom` against
    * a persisted index at scale; only ranks flow into the fusion),
    * then one |pool|-sized full-outer join + a bounded sort. The
    * rank windows run on ≤poolK-row frames — the single-partition
    * window is over an already-top-k pool, never the corpus. The
    * query vector is a corpus vector by id (`queryVecId`), so the
    * whole pipeline is engine-reproducible and the DuckDB oracle
    * hash-checks the fused ranking end-to-end. */
  def hybridSearch(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVecId: Long, k: Int, k0: Int = 60, poolK: Int = 100): DataFrame = {
    val bm = bm25Ranked(bm25Search(docs, terms, topK = poolK))
    val cos = graft.operators.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === queryVecId), emb, poolK)
      .select(col("neighbor_id").as("doc_id"), col("rk").as("cos_rank"))
    rrfFuse(bm, cos, k, k0)
  }

  /** [[hybridSearch]] against the PERSISTED artifacts — the serving
    * shape: keyword ranks from the segmented BM25 index
    * ([[bm25SearchFrom]], postings pruned to the query terms'
    * buckets) and vector ranks from the IVFPQ index
    * ([[graft.operators.Similarity.ivfpqTopKFrom]], cell-pruned ADC,
    * rotated automatically when the index carries an OPQ sidecar) —
    * the corpus is touched by NEITHER branch at query time, and both
    * indexes maintain incrementally from the same CDC stream
    * (bm25IndexStream / annIndexStream). `queryVec` is a (vec_id,
    * embedding) frame, usually one row. */
  def hybridSearchFrom(spark: SparkSession, bm25IndexPath: String,
      annIndexPath: String, terms: Seq[String], queryVec: DataFrame,
      k: Int, k0: Int = 60, poolK: Int = 100, nprobe: Int = 4,
      nBuckets: Int = 64): DataFrame = {
    val bm = bm25Ranked(
      bm25SearchFrom(spark, bm25IndexPath, terms, topK = poolK, nBuckets = nBuckets))
    val ann = graft.operators.Similarity
      .ivfpqTopKFrom(spark, annIndexPath, queryVec, k = poolK, nprobe = nprobe)
      .select(col("neighbor_id").as("doc_id"), col("rk").as("cos_rank"))
    rrfFuse(bm, ann, k, k0)
  }

  // ranks for the keyword pool: the window runs on the ≤poolK-row
  // already-top-k frame, never the corpus
  private def bm25Ranked(pool: DataFrame): DataFrame = {
    val wB = Window.orderBy(col("bm25").desc, col("doc_id"))
    pool.withColumn("bm25_rank", row_number().over(wB).cast(LongType))
      .select(col("doc_id"), col("bm25_rank"))
  }

  /** The RRF fusion core, exposed for any pair of ranked lists:
    * full-outer join on doc_id, score = Σ 1/(k0 + rank) over the
    * lists that retrieved the doc (a missing side contributes 0),
    * top-k by (score desc, doc_id). */
  def rrfFuse(bmRanked: DataFrame, cosRanked: DataFrame, k: Int,
      k0: Int = 60): DataFrame =
    bmRanked.join(cosRanked, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k0) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("cos_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "bm25_rank", "cos_rank", "rrf")

  /** Auto-compaction policy: fold the index to one segment once more
    * than `maxSegments` have accumulated (read amplification grows
    * with segment count — every search unions every segment's
    * postings). The new segment id clears BOTH existing `seg=` dirs
    * AND every id recorded in the stream's `_batches/` allocation map
    * — an id a crashed-but-allocated batch holds must never be
    * reused, or its replay would overwrite the compacted segment with
    * one delta. Same non-concurrency contract as
    * [[compactBm25Index]]: run between micro-batches, not during one.
    * Returns the new segment id when compaction ran. */
  def maybeCompactBm25Index(spark: SparkSession, path: String,
      maxSegments: Int = 8): Option[Long] = {
    val segs = bm25Segments(spark, path)
    if (segs.size <= maxSegments) None
    else {
      val fs = new org.apache.hadoop.fs.Path(s"$path/_batches")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // max over `_max` AND the marker scan, not `_max` alone: on an
      // index written before `_max` existed (or when the allocator's
      // `_max` write was lost in its crash window) a marker can sit
      // ABOVE `_max`; compacting onto that id would make the crashed
      // batch's replay see the compacted segment's _SUCCESS and
      // silently skip — the CDC batch would vanish from the index.
      // Markers are pruned to ≤100 on every allocation, so the scan is
      // bounded at compaction cadence.
      val newId = math.max(segs.max,
        math.max(readAllocMax(fs, path), markerScanMax(fs, path))) + 1
      writeAllocMax(fs, path, newId)
      compactBm25Index(spark, path, newId)
      pruneBatchMarkers(fs, path)
      Some(newId)
    }
  }

  /** Highest segment id the index has ever ALLOCATED (segments may
    * since have been compacted away — allocated ids must never be
    * reused, or a crashed batch's replay would overwrite a compacted
    * segment with one delta). Maintained as a single `_batches/_max`
    * file so the per-micro-batch allocation path reads ONE file; the
    * old shape opened EVERY `batch-<id>` marker — O(markers) driver FS
    * opens per batch, O(N²) cumulative, minutes of object-store
    * metadata RTTs per micro-batch after a year at minute cadence.
    * Falls back to one full marker scan only when `_max` is absent
    * (bootstrap, or the crash window inside [[writeAllocMax]]),
    * skipping crash-leftover hidden `.batch-<id>.tmp` files and
    * tolerating unparseable content — an empty tmp file must not wedge
    * the stream with NumberFormatException forever. */
  private[graft] def readAllocMax(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Long = {
    val maxFile = new org.apache.hadoop.fs.Path(s"$path/_batches/_max")
    val fromFile =
      if (!fs.exists(maxFile)) None
      else {
        val in = fs.open(maxFile)
        try scala.util.Try(
          scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong).toOption
        finally in.close()
      }
    fromFile.getOrElse(markerScanMax(fs, path))
  }

  /** Max segment id recorded across every `batch-<id>` marker — the
    * bootstrap/repair path behind [[readAllocMax]] and the compaction
    * belt-and-braces in [[maybeCompactBm25Index]]. Skips hidden files
    * (crash-leftover `.batch-<id>.tmp` / `._max.tmp-*`) and tolerates
    * unparseable content. */
  private[graft] def markerScanMax(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_batches")
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator
      .filter(_.getPath.getName.startsWith("batch-"))
      .flatMap { st =>
        val in = fs.open(st.getPath)
        try scala.util.Try(
          scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong).toOption
        finally in.close()
      }.foldLeft(0L)(math.max)
  }

  /** Advance `_batches/_max` to `segId` (tmp+rename; the delete→rename
    * window can only LOSE the file, never corrupt it — a missing `_max`
    * re-derives via [[readAllocMax]]'s bootstrap scan). Single-writer,
    * like the rest of the index. */
  private[graft] def writeAllocMax(fs: org.apache.hadoop.fs.FileSystem,
      path: String, segId: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_batches")
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s"._max.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(segId.toString.getBytes("UTF-8")) finally out.close()
    val dest = new org.apache.hadoop.fs.Path(dir, "_max")
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"could not publish $dest")
  }

  /** Drop batch→segment markers older than the newest `keepNewest`.
    * Safe because structured streaming replays only the LATEST
    * uncommitted batch (batch ids are monotonic), so a marker hundreds
    * of batches behind the head can never be consulted again — and
    * with [[readAllocMax]]'s `_max` file, markers no longer feed
    * allocation. Called at compaction time: without it the `_batches/`
    * dir grows one file per micro-batch forever. */
  private[graft] def pruneBatchMarkers(fs: org.apache.hadoop.fs.FileSystem,
      path: String, keepNewest: Int = 100): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_batches")
    if (fs.exists(dir))
      fs.listStatus(dir)
        .filter(_.getPath.getName.startsWith("batch-"))
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("batch-").toLong -> st.getPath).toOption)
        .sortBy(-_._1)
        .drop(keepNewest)
        .foreach { case (_, p) => fs.delete(p, false) }
  }

  private def bm25Segments(spark: SparkSession, path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("seg=") => n.stripPrefix("seg=").toLong }
      .sorted.toSeq
  }

  // Explicit sub-artifact schemas: a segment from a delete-only delta
  // has EMPTY postings/lens parquet dirs, and schema inference on an
  // empty dir throws — enforced schemas read them as empty frames.
  private val postingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, tok STRING, tf BIGINT, tok_bucket BIGINT")
  private val lensSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, dl BIGINT")
  private val tombstonesSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT")
  private def bm25SubSchema(sub: String) = sub match {
    case "postings" => postingsSchema
    case "lens" => lensSchema
    case "tombstones" => tombstonesSchema
  }

  /** [[bm25Search]] against a segmented index: per segment the query
    * terms' buckets are computed with the SAME hashing Spark applied
    * at write time, so each postings read prunes to the matching
    * partition directories (executed-scan file count spec-asserted);
    * the corpus is never re-tokenized. A doc's LIVE version is its
    * newest posted segment, provided no newer-or-equal tombstone
    * supersedes it — liveness is decided on the |docs|-sized lens
    * frame, then postings join the live set on (doc, seg). Corpus
    * stats (n_docs, avgdl) come from the live lens at query time, so
    * they always reflect the maintained corpus. */
  def bm25SearchFrom(spark: SparkSession, path: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20,
      nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    val segs = bm25Segments(spark, path)
    val buckets = terms.toDS()
      .select(pmod(xxhash64(col("value")), lit(nBuckets.toLong)))
      .collect().map(_.getLong(0)).distinct.toSeq
    def perSeg(sub: String) = segs.map(g =>
      spark.read.schema(bm25SubSchema(sub)).parquet(s"$path/seg=$g/$sub")
        .withColumn("seg", lit(g)))
      .reduce(_.unionByName(_))
    val lensAll = perSeg("lens")
    val tombAll = perSeg("tombstones")
    // live doc versions: newest posted seg, unless a tombstone with
    // seg >= that (and no newer re-post) supersedes the doc entirely
    val live = lensAll.groupBy("doc_id")
      .agg(max(struct(col("seg"), col("dl"))).as("__last"))
      .select(col("doc_id"), col("__last.seg").as("seg"), col("__last.dl").as("dl"))
      .join(tombAll.groupBy("doc_id").agg(max(col("seg")).as("__tseg")),
        Seq("doc_id"), "left")
      .filter(col("__tseg").isNull || col("seg") >= col("__tseg"))
      .drop("__tseg")
    val stats = live.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(col("dl").cast(DoubleType)).as("avgdl"))
    val hits = perSeg("postings")
      .filter(col("tok_bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
      .select(col("doc_id"), col("seg"), col("tok"), col("tf"))
      .join(live.select(col("doc_id"), col("seg"), col("dl")), Seq("doc_id", "seg"))
    val dfreq = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    hits.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 4).as("bm25"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Top-k corpus terms per language (tokens of length ≥ `minLen`,
    * ranked count DESC with token ASC tie-break) — the vocabulary
    * inspection step of corpus analysis. Scale shape: the explode is
    * one narrow generator pass; the (lang, token) count is map-side
    * combinable (the shuffle carries per-partition partial counts, not
    * token occurrences); and the `row_number ≤ k` filter over the
    * count frame is rewritten to TopKPerKeyExec by the graft rule —
    * bounded per-language heaps instead of a full per-language sort of
    * the vocabulary. */
  def topTerms(docs: DataFrame, minLen: Int, k: Int): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
    docs.select(col("lang"), tokens(col("text")).as("tk"))
      // projection barrier: explode must not re-evaluate tokens()
      .select(col("lang"), explode(col("tk")).as("token"))
      .filter(length(col("token")) >= minLen)
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
  }

  /** Boilerplate density — the corpus-cleaning signal behind
    * `Dedup.capShingleDf`: per doc, the share of its k-shingles that
    * are corpus-HOT (document frequency > `hotDf`). Docs made largely
    * of template/boilerplate text (nav bars, license blocks, spam
    * templates) score near 1 and get dropped or down-weighted by the
    * pipeline. One shingle pass feeds both the df aggregate and the
    * per-doc counts (localCheckpoint — see Dedup.pairOverlapStats);
    * hot shingles are few by construction, so their set broadcasts. */
  def boilerplateShare(docs: DataFrame, k: Int, hotDf: Int): DataFrame = {
    val sh = Dedup.docShingles(docs, k).materialize()
    val hot = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotDf).select("shingle")
    val tot = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hotCnt = sh.join(broadcast(hot), Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    tot.join(hotCnt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hot"))
      .withColumn("hot_share", round(col("n_hot").cast(DoubleType) / col("n_sh"), 6))
  }

  /** Within-document repetition profile — the Gopher/MassiveText-style
    * quality filters that catch degenerate generations and scraped
    * boilerplate loops: duplicate-token fraction, duplicate-bigram
    * fraction, and the share of bigram occurrences claimed by the
    * single most frequent bigram (a looping doc scores near 1 on the
    * last even when every individual token is common). All ratios
    * derive from integer counts with ONE rounded division at the
    * output boundary, so any engine reproduces them bit-for-bit.
    * Shape: one tokenize pass; the bigram counts are per-doc (map-side
    * combinable groupBy on (doc_id, bg)) — no corpus-wide state, so
    * the pass is embarrassingly parallel at any scale. */
  def repetition(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      // projection barrier: the bigram generator below must not
      // re-evaluate tokens() per produced element
      .materialize()
    val bg = t.select(col("doc_id"), explode(
        when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => concat_ws(" ", element_at(col("tk"), i + 1),
              element_at(col("tk"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("bg"))
    val agg = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bg"), count(lit(1)).as("n_dist_bg"),
        max(col("c")).as("top_bg"))
    t.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("tk")).cast(LongType).as("n_tokens"),
        round(lit(1.0) - size(array_distinct(col("tk"))).cast(DoubleType)
          / size(col("tk")), 4).as("dup_tok_frac"),
        coalesce(col("n_bg"), lit(0L)).cast(LongType).as("n_bigrams"),
        round(when(col("n_bg").isNull, lit(0.0))
          .otherwise(lit(1.0) - col("n_dist_bg").cast(DoubleType) / col("n_bg")), 4)
          .as("dup_bigram_frac"),
        round(when(col("n_bg").isNull, lit(0.0))
          .otherwise(col("top_bg").cast(DoubleType) / col("n_bg")), 4)
          .as("top_bigram_frac"))
  }

  /** Overlapping token-window chunking — the RAG / context-window
    * segmentation pass: windows of `win` tokens starting every
    * `stride` tokens (consecutive chunks overlap `win - stride`), the
    * tail chunk keeping whatever remains. Emits chunk index, token
    * count, and the chunk-content md5 (the id a chunk store / vector
    * index keys on) rather than the chunk text itself, so the output
    * stays metadata-sized. One narrow generator per doc — no shuffle,
    * no corpus state; chunk identity is pure arithmetic both engines
    * reproduce. */
  def chunkTokens(docs: DataFrame, win: Int, stride: Int): DataFrame = {
    require(stride > 0 && win >= stride, s"need 0 < stride=$stride <= win=$win")
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("tk")), lit(stride)),
          p => struct(floor((p - 1) / stride).cast(LongType).as("chunk_idx"),
            slice(col("tk"), p, lit(win)).as("ck")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        size(col("c.ck")).cast(LongType).as("n_tokens"),
        md5(concat_ws(" ", col("c.ck"))).as("chunk_md5"))
  }

  /** Normalized-content fingerprint for cross-snapshot text dedup. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(normText(col("text"))).as("fp"),
      length(normText(col("text"))).cast(LongType).as("norm_len"))

  /** Zipf-fit of the per-language token frequency distribution: the
    * least-squares slope/intercept of ln(count) over ln(rank) across
    * the top `topN` tokens. Natural corpora slope ≈ −1; a corpus whose
    * slope drifts far off is machine-generated, template-heavy, or
    * mis-segmented — a distribution-level quality gate next to the
    * per-doc filters.
    *
    * Scale/portability shape: the rank window rewrites to
    * TopKPerKeyExec (k-heap per language — no per-language vocabulary
    * sort); regression runs on sufficient statistics (Σx, Σy, Σxy,
    * Σx²) over (ln rank, ln count) ROUNDED to 6 decimals and summed as
    * exact decimals — order-independent under any partitioning — with
    * the float division once per language at the output boundary
    * (same discipline as q_corr). */
  def zipf(docs: DataFrame, topN: Int): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
    val ranked = docs.select(col("lang"), tokens(col("text")).as("tk"))
      .select(col("lang"), explode(col("tk")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= topN)
    val x = round(log(col("rk").cast(DoubleType)), 6).cast(DecimalType(8, 6))
    val y = round(log(col("cnt").cast(DoubleType)), 6).cast(DecimalType(8, 6))
    ranked.select(col("lang"), x.as("x"), y.as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum(col("x") * col("y")).cast(DoubleType).as("sxy"),
        sum(col("x") * col("x")).cast(DoubleType).as("sxx"))
      .withColumn("nn", col("n_terms").cast(DoubleType))
      // degenerate single-term languages have zero x-variance: the fit
      // is undefined → null (ANSI mode forbids the bare 0/0)
      .withColumn("den", col("nn") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_raw",
        when(col("den") =!= 0.0,
          (col("nn") * col("sxy") - col("sx") * col("sy")) / col("den")))
      .select(col("lang"), col("n_terms"),
        round(col("slope_raw"), 6).as("slope"),
        round((col("sy") - col("slope_raw") * col("sx")) / col("nn"), 6).as("intercept"))
  }

  /** Greedy left-to-right merge of one symbol pair in a sequence —
    * the standard BPE apply step ("aaa" under (a,a) → [aa, a]). */
  private[operators] def mergePairIn(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Learn the first `nMerges` BPE merges from the corpus — vocabulary
    * induction (Sennrich et al. '16), the trainer behind [[bpeIsh]]'s
    * pretokenizer: train on the WORD-TYPE frame (token, freq) — the
    * corpus is scanned ONCE for frequencies, and every iteration runs
    * over |word types| × avg-word-len symbols, sublinear in corpus
    * bytes at any scale. Per iteration: weighted adjacent-pair counts
    * (map-side combinable), the arg-max merge via a top-1 heap
    * (TakeOrderedAndProject — one row to the driver, the only collect,
    * metadata-sized), then a distributed greedy re-segmentation with
    * lineage truncated per round (localCheckpoint — an iterated map
    * otherwise stacks 2·nMerges plan nodes). Deterministic tie-break:
    * count desc, then (lhs, rhs) binary-ascending — identical on any
    * engine, which is what makes the rank-1 gate oracle-checkable.
    * Stops early when no adjacent pair remains. */
  def learnBpeMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toArray, f) }
      .materialize()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = words.flatMap { case (syms, f) =>
          (0 until syms.length - 1).map(j => (syms(j), syms(j + 1), f))
        }.toDF("lhs", "rhs", "f")
        .groupBy("lhs", "rhs").agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((i + 1L, a, b, c))
        words = words.map { case (syms, f) => (mergePairIn(syms, a, b), f) }
          .materialize()
        i += 1
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Apply a learned merge list as a deterministic BPE ENCODER — the
    * Sennrich '16 apply phase closing the loop [[learnBpeMerges]]
    * opens: each token splits to characters and every merge applies
    * in RANK ORDER, each rank one greedy left-to-right pass
    * ([[mergePairIn]] — byte-for-byte the trainer's own segmentation,
    * so encoding the training corpus under its own merges reproduces
    * the trainer's final word shapes exactly). The merge list is
    * `nMerges` rows by construction — collected once and BROADCAST
    * into a narrow typed map (never a join: the corpus side stays
    * shuffle-free); a per-partition memo exploits the Zipf head (a
    * few thousand distinct tokens dominate any corpus partition).
    * One row per doc: word/char/BPE-piece counts — the
    * token-accurate budgeting inputs ([[Pipeline.tokenBudget]]). */
  def bpeEncode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked: Array[(String, String)] = merges.select("rank", "lhs", "rhs")
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    val bc = spark.sparkContext.broadcast(ranked)
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, toks) =>
          var pieces = 0L
          var chars = 0L
          var words = 0L
          toks.foreach { w =>
            if (w.nonEmpty) {
              words += 1
              chars += w.length
              pieces += memo.getOrElseUpdate(w, {
                var syms = w.map(_.toString).toArray
                ms.foreach { case (a, b) => syms = mergePairIn(syms, a, b) }
                syms.length
              })
            }
          }
          (id, words, chars, pieces)
        }
      }.toDF("doc_id", "n_words", "n_chars", "n_bpe_pieces")
  }

  /** Lexical-diversity profile — the vocabulary-richness quality
    * signal (low type/token ratio = repetitive or templated text;
    * high hapax share = rich or noisy): per doc, token count, distinct
    * token count, TTR, and the share of types occurring exactly once.
    * One explode + two map-side-combinable aggregates keyed by doc_id
    * (no corpus-wide state at all, so it scales embarrassingly); every
    * division is integer-fed and happens once at the output boundary. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      // projection barrier: explode must not re-evaluate tokens()
      .select(col("doc_id"), explode(col("tk")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("ttr"),
        round(col("n_hapax").cast(DoubleType) / col("n_types"), 6).as("hapax_share"))

  /** Per-document top-`k` TF-IDF terms — the classic keyword
    * extractor (what is this document ABOUT) next to [[topTerms]]'
    * corpus-level vocabulary view. idf = ln((N+1)/(df+1)), smoothed so
    * a corpus-universal term scores ~0 instead of dividing by zero.
    * Scale shape: ONE tokenize/explode feeds both the per-doc tf and
    * the document-frequency aggregate (localCheckpoint — the
    * boilerplateShare discipline); df joins back on the token equi-key
    * (vocabulary-sized, shuffles fine — never broadcast: a 100 TB
    * corpus's vocabulary isn't driver-sized); ranking rounds BEFORE
    * ordering (engine-stable under double ULP drift, the
    * ann_cosine_topk precedent) and the `row_number ≤ k` filter is
    * TopKPerKey-rewritable — bounded per-doc heaps, no full sort. */
  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal runs of non-stopword tokens; each word scores
    * degree/frequency over the DOC's candidates (degree = Σ lengths
    * of candidates containing it — co-occurrence favors multi-word
    * terms); a phrase scores the sum of its word scores; top-k
    * distinct phrases per doc. Everything is doc-scoped: the window
    * partitions by doc, and every groupBy/join keys on (doc_id, …) —
    * embarrassingly parallel across documents, no corpus-wide state.
    * Ranking uses the ROUNDED score (then phrase text) so the order
    * is reproducible across engines — the oracle replays the whole
    * computation in SQL. */
  def rakeKeywords(docs: DataFrame, k: Int, lang: String = "en"): DataFrame = {
    val stops = stopwords(lang)
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phrase id = running stopword count: tokens of one candidate run
    // share a group, and groups advance at each delimiter
    val grouped = tok
      .withColumn("is_stop", col("w").isin(stops: _*))
      .withColumn("grp",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(byDoc))
      .filter(!col("is_stop"))
    val phrases = grouped.groupBy("doc_id", "grp").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x("w")), " ").as("phrase"),
      count(lit(1)).as("plen"))
    val wordPhrase = grouped.select("doc_id", "grp", "w")
      .join(phrases, Seq("doc_id", "grp"))
    val wscore = wordPhrase.groupBy("doc_id", "w").agg(
      (sum("plen").cast(DoubleType) / count(lit(1))).as("ws"))
    val scored = wordPhrase.join(wscore, Seq("doc_id", "w"))
      .groupBy("doc_id", "grp", "phrase", "plen")
      .agg(round(sum("ws"), 4).as("score"))
      // identical phrase text recurring in a doc is ONE candidate
      .groupBy("doc_id", "phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("plen")).as("n_words"), max(col("score")).as("score"))
    val rk = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("phrase"))
    scored.withColumn("rk", row_number().over(rk).cast(LongType))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "phrase", "n_words", "n_occurrences", "score")
  }

  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(col("tk")).as("tok"))
      .filter(length(col("tok")) >= 3) // drop stop-length tokens
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .materialize()
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count_distinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast(DoubleType)
        * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"), col("rk"))
  }

  /** Interpolated bigram language-model perplexity per document — the
    * model-based quality signal of the CCNet pipeline (Wenzek et al.,
    * LREC 2020: corpora are filtered/bucketed by LM perplexity):
    * fluent prose scores low, boilerplate and garble score high. The
    * model is self-trained on the corpus in the same pass (unigram +
    * bigram counts), scored with Jelinek–Mercer interpolation
    * `P(w2|w1) = λ·C(w1w2)/C(w1) + (1−λ)·C(w2)/T` — deterministic and
    * smoothing-closed (the unigram term is positive for every
    * in-corpus token, so no zero probabilities).
    *
    * SCALE: the token stream only ever meets equi-groupBys and
    * equi-joins on token keys — shuffles linear in corpus token
    * count, no all-pairs anywhere; the count frames SHUFFLE-join
    * (vocabulary grows with the corpus — never broadcast; only the
    * single-row total broadcasts); bigram adjacency is pure array
    * algebra ([[docBigramCounts]] — a narrow map, no window, no
    * per-doc shuffle before the combine). Per-doc bigrams collapse to
    * (doc, w1, w2, k) BEFORE meeting the global counts, so the join
    * stream is distinct-bigrams-per-doc, not token instances. */
  /** Per-doc adjacent-pair counts (doc_id, w, w2, k) — bigram
    * adjacency via pure ARRAY algebra (zip the token array with its
    * own tail), so extraction is a narrow map: no window, no shuffle
    * before the per-doc combine. Single-token docs yield no pairs. */
  private def docBigramCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))).as("w"),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))).as("w2"))).as("pz"))
      .select(col("doc_id"), col("pz.w").as("w"), col("pz.w2").as("w2"))
      .groupBy("doc_id", "w", "w2").agg(count(lit(1)).as("k"))

  def bigramPerplexity(docs: DataFrame, lambda: Double = 0.9): DataFrame = {
    val big = docBigramCounts(docs)
      .materialize() // branches into global bigram counts + scoring
    val uni = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .materialize() // joined twice (w1 and w2 side), |vocab| rows
    val tot = uni.agg(sum("cw").cast(DoubleType).as("t"))
    val bc = big.groupBy("w", "w2").agg(sum("k").as("cb"))
    big.join(bc, Seq("w", "w2"))
      .join(uni, Seq("w"))
      .join(uni.select(col("w").as("w2"), col("cw").as("cw2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("p", lit(lambda) * col("cb") / col("cw")
        + (lit(1.0) - lit(lambda)) * col("cw2") / col("t"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        (-sum(col("k") * log(col("p"))) / sum("k")).as("raw_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("raw_nll"), 6).as("nll"),
        round(exp(col("raw_nll")), 4).as("ppl"))
  }

  /** Train a [[CompactBigramLm]]: top-`maxVocab` unigrams and
    * top-`maxBigrams` bigrams by corpus count (count-then-token
    * tiebreaks — deterministic), with the FULL corpus totals kept as
    * normalization constants. The two `collect`s are bounded by the
    * caps BY CONSTRUCTION — this is the "train once on a curated
    * reference, prune, broadcast" production shape (CCNet ships a
    * compact KenLM the same way), not a corpus-sized driver pull. */
  def compactBigramLm(docs: DataFrame, maxVocab: Int, maxBigrams: Int,
      lambda: Double = 0.9): CompactBigramLm = {
    val uniAll = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .materialize() // branches into totals + the pruned head
    val totals = uniAll.agg(
      coalesce(sum("cw"), lit(0L)).as("t"), count(lit(1)).as("v")).head()
    require(totals.getLong(0) > 0L, "compactBigramLm: empty training corpus")
    val uni = uniAll.orderBy(col("cw").desc, col("w")).limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = docBigramCounts(docs).groupBy("w", "w2").agg(sum("k").as("cb"))
      .orderBy(col("cb").desc, col("w"), col("w2")).limit(maxBigrams)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    CompactBigramLm(uni, big, totals.getLong(0), totals.getLong(1), lambda)
  }

  /** Corpus-level PMI collocations (Church & Hanks 1990): score every
    * adjacent token pair by pointwise mutual information
    * `ln(c(xy)·T / (c(x)·c(y)))` over the WHOLE corpus and keep the
    * top-`k` pairs with at least `minCount` occurrences — the classic
    * "which word pairs co-occur far more than chance" signal that
    * surfaces fixed phrases, named entities, and template boilerplate
    * in a training corpus. Count frames are vocabulary-sized and
    * SHUFFLE-join (never broadcast); the support filter shrinks the
    * pair frame before the two unigram joins; the one global top-k is
    * a TakeOrderedAndProject over an already-tiny frame. Every factor
    * in the PMI ratio is an integer below 2^53, so the double products
    * are exact and the single division + ln round identically across
    * engines (one `round(…, 6)` at the output boundary). */
  def pmiCollocations(docs: DataFrame, minCount: Int, k: Int): DataFrame = {
    val uni = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .materialize() // joined on both pair sides + totalled
    val tot = uni.agg(sum("cw").as("t"))
    val pairs = docBigramCounts(docs)
      .groupBy("w", "w2").agg(sum("k").as("cb"))
      .filter(col("cb") >= minCount)
    pairs.join(uni, Seq("w"))
      .join(uni.select(col("w").as("w2"), col("cw").as("cw2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w"), col("w2"), col("cb").cast(LongType).as("n_pair"),
        round(log(col("cb").cast(DoubleType) * col("t").cast(DoubleType)
          / (col("cw").cast(DoubleType) * col("cw2").cast(DoubleType))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w"), col("w2"))
      .limit(k)
  }

  /** Score docs against a FROZEN compact model — [[bigramPerplexity]]'s
    * production sibling (there the model is self-trained corpus-wide
    * and count frames shuffle-join; here the reference model rides a
    * broadcast and scoring is one narrow map — the shape an ingest
    * guard needs, and the batch-parity twin of
    * [[graft.streaming.StreamOps.perplexityFilter]]). Docs with fewer
    * than two tokens score null (no evidence — the caller decides). */
  def perplexityWith(docs: DataFrame, model: CompactBigramLm): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        bc.value.score(CompactBigramLm.normTokens(text)) match {
          case Some((n, nll, ppl)) =>
            (id, n, math.rint(nll * 1e6) / 1e6, math.rint(ppl * 1e4) / 1e4)
          case None => (id, 0L, Double.NaN, Double.NaN)
        }
      }
      .toDF("doc_id", "n_bigrams", "nll", "ppl")
      .select(col("doc_id"), col("n_bigrams"),
        when(col("nll").isNaN, lit(null)).otherwise(col("nll")).as("nll"),
        when(col("ppl").isNaN, lit(null)).otherwise(col("ppl")).as("ppl"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> { (s, d) =>
      // Rows-only (merges 2+ depend on the evolving segmentation — the
      // crafted-corpus spec pins the sequence; text_bpe_gate
      // hash-checks rank 1): the first 10 learned merges.
      learnBpeMerges(Tables.documents(s, d), 10).orderBy("rank")
    },

    "text_bpe_gate" -> { (s, d) =>
      // HASH-CHECKED gate: the rank-1 merge must equal the top
      // freq-weighted adjacent character pair computed declaratively.
      learnBpeMerges(Tables.documents(s, d), 1)
        .select("lhs", "rhs", "pair_count")
    },

    "text_bpe_encode" -> { (s, d) =>
      // HASH-CHECKED encode: the trained rank-1 vocabulary applied by
      // the real encoder ([[bpeEncode]] — greedy ranked merge passes),
      // per-doc piece counts. DuckDB REPLAYS the application: the
      // rank-1 pair is SQL-computable (text_bpe_gate), and one greedy
      // merge pass over a token is pure string algebra —
      // length(replace(token, pair, <1 char>)) IS the piece count
      // (replace scans left-to-right non-overlapping, exactly
      // mergePairIn). Deeper vocabularies encode identically
      // (spec-pinned against hand-worked merges); the driver checks
      // the rank the oracle can express.
      val docs = Tables.documents(s, d)
      bpeEncode(docs, learnBpeMerges(docs, 1)).orderBy("doc_id")
    },

    "text_ttr" -> { (s, d) =>
      lexicalDiversity(Tables.documents(s, d)).orderBy("doc_id")
    },

    "text_tfidf" -> { (s, d) =>
      tfidfTopTerms(Tables.documents(s, d), 3).orderBy("doc_id", "rk")
    },

    "text_perplexity" -> { (s, d) =>
      bigramPerplexity(Tables.documents(s, d)).orderBy("doc_id")
    },

    "pipe_ccnet" -> { (s, d) =>
      // CCNet's head/middle/tail split (Wenzek et al., LREC 2020):
      // per language, bucket docs into perplexity TERTILES against a
      // reference LM — "head" is the cleanest third the pretraining
      // mix samples hardest. Production CCNet computes percentile
      // cutoffs once and stream-assigns; this does the same with the
      // bounded-memory exact quantile selection (never a per-lang
      // global sort of the corpus): tertile boundaries of the
      // boundary-rounded nll via exactQuantiles (quantile_cont
      // semantics — the q_percentile-proven match), broadcast-joined
      // back (|langs| rows), then one metadata-sized rollup. min/max
      // of round-6 values are order-independent, so every output
      // column hashes deterministically.
      val docs = Tables.documents(s, d)
      val pl = bigramPerplexity(docs)
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .materialize() // feeds the quantile passes + the bucket scan
      val qs = Percentiles.exactQuantiles(pl, "lang", "nll",
        Seq("q33" -> 1.0 / 3, "q66" -> 2.0 / 3))
      pl.join(broadcast(qs), Seq("lang"))
        .withColumn("bucket",
          when(col("nll") <= col("q33"), "head")
            .when(col("nll") <= col("q66"), "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_tokens"),
          min(col("nll")).as("min_nll"),
          max(col("nll")).as("max_nll"))
        .orderBy("lang", "bucket")
    },

    "text_keywords" -> { (s, d) =>
      rakeKeywords(Tables.documents(s, d), 3).orderBy("doc_id", "rk")
    },

    "text_collocations" -> { (s, d) =>
      pmiCollocations(Tables.documents(s, d), minCount = 5, k = 30)
    },

    "text_textrank" -> { (s, d) =>
      // TextRank corpus keywords (Mihalcea & Tarau, EMNLP 2004):
      // PageRank over the word co-occurrence graph — a word matters
      // when it co-occurs with words that matter, the recursion raw
      // counts (text_topterms) and PMI (text_collocations) can't
      // express. Nodes = tokens, edges = DISTINCT adjacent-token
      // pairs (window 2, the paper's default), symmetric; ranks ride
      // Graph.pagerank's exact-integer power iteration so the oracle
      // unrolls the same arithmetic instead of trusting float
      // convergence. Edge set is bigram-vocabulary-sized (Zipf-
      // bounded), shuffled not broadcast; top-K via
      // TakeOrderedAndProject.
      val docs = Tables.documents(s, d)
      val pairs = docs.select(tokens(col("text")).as("tk"))
        .select(explode(shingles(col("tk"), 2)).as("bg"))
        .select(element_at(split(col("bg"), " "), 1).as("w1"),
          element_at(split(col("bg"), " "), 2).as("w2"))
        .filter(col("w1") =!= col("w2") && length(col("w1")) > 0 && length(col("w2")) > 0)
        .select(least(col("w1"), col("w2")).as("a"),
          greatest(col("w1"), col("w2")).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
      Graph.pagerank(edges, iters = 5, scale = 1000000000000L)
        .select(col("node").as("word"), col("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("word")).limit(30)
    },

    "text_zipf" -> { (s, d) =>
      zipf(Tables.documents(s, d), 300).orderBy("lang")
    },

    "text_compress" -> { (s, d) =>
      // DEFLATE compression-ratio quality signal (Gopher-family):
      // template spam and looping generations compress far below
      // natural prose, catching long-range repetition the
      // token/bigram fractions miss. Codegen'd native expression —
      // one narrow pass, no shuffle. Rows-only: the exact ratio is
      // zlib-implementation-defined, deterministic within the Spark
      // fleet but not engine-portable.
      Tables.documents(s, d)
        .select(col("doc_id"),
          round(org.apache.spark.sql.graft.DeflateRatioFunctions.deflateRatio(col("text")), 4)
            .as("ratio"))
        .withColumn("repetitive", col("ratio") < 0.35)
        .orderBy("doc_id")
    },

    "text_stats" -> { (s, d) => stats(Tables.documents(s, d)).orderBy("doc_id") },
    "text_quality" -> { (s, d) => quality(Tables.documents(s, d)).orderBy("doc_id") },
    "text_langid" -> { (s, d) => langid(Tables.documents(s, d)).orderBy("doc_id") },
    "text_fingerprint" -> { (s, d) => fingerprints(Tables.documents(s, d)).orderBy("doc_id") },

    "text_surprise" -> { (s, d) =>
      // Corpus-LM "surprise" score — the cheap stand-in for the
      // perplexity filter a training pipeline runs (CCNet-style): score
      // each doc by how rare its bigram continuations are under the
      // CORPUS's own bigram statistics. Per doc we emit
      // Σ count(prefix) / Σ count(bigram) over its bigram OCCURRENCES —
      // ≥ 1, higher = rarer continuations (gibberish scores high).
      // Integer sums keep it order-independent; ONE double division at
      // the output boundary (no per-term log, whose libm rounding
      // differs across engines).
      // Shape: one generator pass → bigram frame (materialized once,
      // feeds the two corpus aggregates AND the per-doc join), two
      // equi-joins on (bg | w1) — count frames, map-side combinable.
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        // projection barrier: explode must not re-evaluate tokens()
        .select(col("doc_id"), explode(
          when(size(col("tk")) >= 2,
            transform(sequence(lit(0), size(col("tk")) - 2),
              i => struct(element_at(col("tk"), i + 1).as("w1"),
                concat_ws(" ", element_at(col("tk"), i + 1),
                  element_at(col("tk"), i + 2)).as("bg"))))
            .otherwise(array().cast("array<struct<w1:string,bg:string>>"))).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
        .materialize()
      val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("cnt_bg"))
      val prefCounts = bg.groupBy("w1").agg(count(lit(1)).as("cnt_pref"))
      bg.join(bgCounts, Seq("bg")).join(prefCounts, Seq("w1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("cnt_pref")).cast(DoubleType) / sum(col("cnt_bg")), 4)
            .as("surprise"))
        .orderBy("doc_id")
    },

    "text_bpe" -> { (s, d) =>
      // BPE-style pretokenizer count: subword-ish pieces where a
      // leading space attaches to the following run (the GPT-2
      // pretokenizer shape, simplified to an RE2-safe alternation so
      // Java regex and DuckDB RE2 agree: letter runs, digit runs,
      // punctuation runs). On normalized lowercase text every
      // non-space char lands in exactly one piece.
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(normText(col("text")),
          lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0)))
          .cast(LongType).as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    "text_rollinghash" -> { (s, d) =>
      // Order-sensitive 8-byte document fingerprint via the codegen'd
      // RollingHashExpr (vs md5's 32-char hex string — 4x smaller keys
      // for 100 TB change detection).
      Tables.documents(s, d).select(
        col("doc_id"),
        org.apache.spark.sql.graft.RollingHashFunctions.rollingHash(normText(col("text"))).as("rhash"))
        .orderBy("doc_id")
    },

    "text_pii" -> { (s, d) => piiScan(Tables.documents(s, d)).orderBy("doc_id") },
    "text_anonymize" -> { (s, d) => anonymize(Tables.documents(s, d)).orderBy("doc_id") },

    "text_repetition" -> { (s, d) =>
      // Gopher-style within-doc repetition profile: dup-token /
      // dup-bigram fractions + top-bigram share — the degenerate-text
      // filters next to text_quality's surface ratios.
      repetition(Tables.documents(s, d)).orderBy("doc_id")
    },

    "text_chunks" -> { (s, d) =>
      // RAG chunking: 30-token windows every 20 tokens (10-token
      // overlap), identified by content md5 — the segmentation feeding
      // a vector index build.
      chunkTokens(Tables.documents(s, d), 30, 20)
        .orderBy("doc_id", "chunk_idx")
    },

    "text_readability" -> { (s, d) =>
      readability(Tables.documents(s, d)).orderBy("doc_id")
    },

    "text_boilerplate" -> { (s, d) =>
      // Share of each doc's 3-shingles appearing in > 5 documents —
      // high scores mark template-heavy docs the cleaning gate drops.
      boilerplateShare(Tables.documents(s, d), 3, 5).orderBy("doc_id")
    },

    "text_confusion" -> { (s, d) =>
      // Language-ID quality monitoring: the labeled×predicted
      // confusion matrix with per-label share — the view that says
      // WHERE the classifier errs, which the flat accuracy of
      // text_langid can't. Tiny |langs|² frame after one combinable
      // count.
      val scored = langid(Tables.documents(s, d))
        .groupBy(col("labeled_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      scored.withColumn("share", round(col("n").cast(DoubleType)
          / sum(col("n")).over(Window.partitionBy("labeled_lang")), 6))
        .orderBy("labeled_lang", "pred_lang")
    },

    "text_topterms" -> { (s, d) =>
      // Per-language top-8 terms of length ≥ 5 — count frame is
      // map-side combined, top-k via the TopKPerKey rewrite.
      topTerms(Tables.documents(s, d), 5, 8).orderBy("lang", "rk")
    },

    "text_bm25" -> { (s, d) =>
      // Keyword search: top-20 docs for a 3-term query under BM25
      // (k1=1.2, b=0.75), ranked by rounded score then doc_id.
      bm25Search(Tables.documents(s, d), Seq("merge", "vector", "window"))
        .orderBy(col("bm25").desc, col("doc_id"))
    },

    "text_hybrid" -> { (s, d) =>
      // RRF fusion of the BM25 keyword ranking and the cosine ranking
      // around corpus vector 7 — both branches and the fused ranks are
      // DuckDB-reproducible, so the hash checks hybrid RETRIEVAL
      // end-to-end (rank arithmetic, tie-breaks, missing-side zeros).
      hybridSearch(Tables.documents(s, d), Tables.embeddings(s, d),
        Seq("merge", "vector", "window"), queryVecId = 7L, k = 20)
    },

    "text_bm25_index" -> { (s, d) =>
      // The SAME search through the persisted index artifact (build
      // once per corpus, then query without re-tokenizing; postings
      // read prunes to the query terms' hash-bucket partitions). Same
      // oracle as text_bm25 — the index path must be result-identical.
      // Cache key = md5 over (dir, file name/len/mtime of the corpus
      // parquet): regenerated data at the same path gets a fresh index.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_${corpusCacheKey(s, d)}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/seg=0/tombstones/_SUCCESS")))
        writeBm25Index(Tables.documents(s, d), path)
      bm25SearchFrom(s, path, Seq("merge", "vector", "window"))
        .orderBy(col("bm25").desc, col("doc_id"))
    },

    "text_bm25_incr" -> { (s, d) =>
      // Index MAINTENANCE end-to-end: segment 0 indexes the corpus;
      // a delta segment re-posts the edited docs (≡ 0 mod 11, word
      // appended) and tombstones their old versions plus deletes
      // (≡ 0 mod 13). The search must rank against the maintained
      // corpus — the oracle runs the full BM25 SQL over the EDITED
      // corpus, so stale postings or wrong liveness fail the hash.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25i_${corpusCacheKey(s, d)}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val docs = Tables.documents(s, d)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/seg=0/tombstones/_SUCCESS")))
        writeBm25Index(docs, path)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/seg=1/tombstones/_SUCCESS"))) {
        val edited = docs.filter(col("doc_id") % 11 === 0 && col("doc_id") % 13 =!= 0)
          .withColumn("text", concat(col("text"), lit(" vector")))
        val removed = docs
          .filter(col("doc_id") % 11 === 0 || col("doc_id") % 13 === 0)
          .select("doc_id")
        appendBm25Segment(edited, removed, path, 1L)
      }
      bm25SearchFrom(s, path, Seq("merge", "vector", "window"))
        .orderBy(col("bm25").desc, col("doc_id"))
    }
  )

  /** Content fingerprint of the corpus — keys the bench-only
    * persisted-index caches above (see [[Tables.fingerprint]]). */
  private def corpusCacheKey(s: SparkSession, dir: String): String =
    Tables.fingerprint(s, dir, "documents")

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val toksSql = s"string_split($normSql, ' ')"

  /** Interpolated-bigram perplexity CTE chain, ending at
    * `ppl(doc_id, n_bigrams, nll, ppl)` — shared by text_perplexity
    * and the CCNet bucketing oracle so both hash the SAME model. */
  private lazy val pplCtes =
    s"""tok AS (SELECT doc_id, $toksSql AS t FROM documents),
       |inst AS (
       |  SELECT doc_id, t[i] AS w, t[i + 1] AS w2
       |  FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)),
       |db AS (
       |  SELECT doc_id, w, w2, COUNT(*) AS k FROM inst
       |  WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
       |uni AS (SELECT w, COUNT(*) AS cw FROM inst GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cw) AS DOUBLE) AS t FROM uni),
       |bc AS (SELECT w, w2, SUM(k) AS cb FROM db GROUP BY 1, 2),
       |scored AS (
       |  SELECT db.doc_id, db.k,
       |    0.9 * cb / cw + (1.0 - 0.9) * cw2 / t AS p
       |  FROM db JOIN bc USING (w, w2) JOIN uni USING (w)
       |    JOIN (SELECT w AS w2, cw AS cw2 FROM uni) u2 USING (w2)
       |  CROSS JOIN tot),
       |ppl AS (
       |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
       |    ROUND(-SUM(k * LN(p)) / SUM(k), 6) AS nll,
       |    ROUND(EXP(-SUM(k * LN(p)) / SUM(k)), 4) AS ppl
       |  FROM scored GROUP BY 1)""".stripMargin

  private def hitsSql(lang: String): String = {
    val set = stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($set)))"
  }

  val oracles: Map[String, String] = Map(
    "text_bpe_gate" ->
      s"""WITH tok AS (
         |  SELECT token AS w FROM (SELECT $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)
         |  WHERE length(token) > 0),
         |wf AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY 1),
         |pairs AS (
         |  SELECT substr(w, CAST(i AS INT), 1) AS lhs,
         |    substr(w, CAST(i AS INT) + 1, 1) AS rhs, SUM(f) AS c
         |  FROM wf, UNNEST(range(1, length(w))) AS u(i)
         |  GROUP BY 1, 2)
         |SELECT lhs, rhs, CAST(c AS BIGINT) AS pair_count
         |FROM pairs ORDER BY c DESC, lhs, rhs LIMIT 1""".stripMargin,

    "text_bpe_encode" ->
      s"""WITH tok AS (
         |  SELECT doc_id, token FROM (SELECT doc_id, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)
         |  WHERE length(token) > 0),
         |wf AS (SELECT token AS w, COUNT(*) AS f FROM tok GROUP BY 1),
         |pairs AS (
         |  SELECT substr(w, CAST(i AS INT), 1) AS lhs,
         |    substr(w, CAST(i AS INT) + 1, 1) AS rhs, SUM(f) AS c
         |  FROM wf, UNNEST(range(1, length(w))) AS u(i)
         |  GROUP BY 1, 2),
         |top1 AS (
         |  SELECT lhs || rhs AS pair FROM pairs
         |  ORDER BY c DESC, lhs, rhs LIMIT 1),
         |enc AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(length(token)) AS BIGINT) AS n_chars,
         |    CAST(SUM(length(replace(token, (SELECT pair FROM top1), chr(1))))
         |      AS BIGINT) AS n_bpe_pieces
         |  FROM tok GROUP BY 1)
         |SELECT d.doc_id, coalesce(e.n_words, 0) AS n_words,
         |  coalesce(e.n_chars, 0) AS n_chars,
         |  coalesce(e.n_bpe_pieces, 0) AS n_bpe_pieces
         |FROM documents d LEFT JOIN enc e USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "text_ttr" ->
      s"""WITH tok AS (
         |  SELECT doc_id, token FROM (SELECT doc_id, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)),
         |c AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_types,
         |  ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6) AS ttr,
         |  ROUND(CAST(COUNT(*) FILTER (WHERE cnt = 1) AS DOUBLE) / COUNT(*), 6) AS hapax_share
         |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, token FROM (SELECT doc_id, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)
         |  WHERE length(token) >= 3),
         |tf AS (SELECT doc_id, token AS tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
         |    ROUND(CAST(tf.tf AS DOUBLE) * ln((n_docs + 1.0) / (df + 1.0)), 6) AS score
         |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
         |SELECT doc_id, tok, tf, CAST(df AS BIGINT) AS df, score,
         |  CAST(rk AS BIGINT) AS rk
         |FROM (SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, tok) AS rk
         |  FROM scored) t
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "text_perplexity" ->
      s"""WITH $pplCtes
         |SELECT doc_id, n_bigrams, nll, ppl FROM ppl ORDER BY 1""".stripMargin,

    "pipe_ccnet" ->
      s"""WITH $pplCtes,
         |pl AS (
         |  SELECT p.doc_id, d.lang, p.n_bigrams, p.nll
         |  FROM ppl p JOIN documents d USING (doc_id)),
         |qs AS (
         |  SELECT lang, quantile_cont(nll, 1.0/3) AS q33,
         |    quantile_cont(nll, 2.0/3) AS q66
         |  FROM pl GROUP BY 1),
         |b AS (
         |  SELECT lang,
         |    CASE WHEN nll <= q33 THEN 'head'
         |         WHEN nll <= q66 THEN 'middle'
         |         ELSE 'tail' END AS bucket,
         |    n_bigrams, nll
         |  FROM pl JOIN qs USING (lang))
         |SELECT lang, bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(n_bigrams) AS BIGINT) AS n_tokens,
         |  MIN(nll) AS min_nll, MAX(nll) AS max_nll
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_keywords" ->
      s"""WITH inst AS (
         |  SELECT doc_id, i AS pos, t[i] AS w
         |  FROM (SELECT doc_id, $toksSql AS t FROM documents),
         |    UNNEST(range(1, len(t) + 1)) AS u(i)),
         |m AS (SELECT doc_id, pos, w,
         |  (w IN (${stopwords("en").map(w => s"'$w'").mkString(", ")})) AS is_stop
         |  FROM inst),
         |g AS (SELECT *, SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
         |    PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM m),
         |wrds AS (SELECT doc_id, grp, pos, w FROM g WHERE NOT is_stop),
         |ph AS (SELECT doc_id, grp, STRING_AGG(w, ' ' ORDER BY pos) AS phrase,
         |    COUNT(*) AS plen
         |  FROM wrds GROUP BY 1, 2),
         |wp AS (SELECT wrds.doc_id, wrds.grp, wrds.w, ph.phrase, ph.plen
         |  FROM wrds JOIN ph USING (doc_id, grp)),
         |ws AS (SELECT doc_id, w, CAST(SUM(plen) AS DOUBLE) / COUNT(*) AS ws
         |  FROM wp GROUP BY 1, 2),
         |ps AS (SELECT wp.doc_id, wp.grp, wp.phrase, wp.plen,
         |    ROUND(SUM(ws.ws), 4) AS score
         |  FROM wp JOIN ws USING (doc_id, w) GROUP BY 1, 2, 3, 4),
         |dedup AS (SELECT doc_id, phrase, COUNT(*) AS n_occurrences,
         |    MAX(plen) AS n_words, MAX(score) AS score
         |  FROM ps GROUP BY 1, 2)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, phrase,
         |  CAST(n_words AS BIGINT) AS n_words,
         |  CAST(n_occurrences AS BIGINT) AS n_occurrences, score
         |FROM (SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, phrase) AS rk
         |  FROM dedup) t
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "text_collocations" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS t FROM documents),
         |inst AS (
         |  SELECT doc_id, t[i] AS w, t[i + 1] AS w2
         |  FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)),
         |uni AS (SELECT w, COUNT(*) AS cw FROM inst GROUP BY 1),
         |tot AS (SELECT SUM(cw) AS t FROM uni),
         |pairs AS (SELECT w, w2, COUNT(*) AS cb FROM inst
         |  WHERE w2 IS NOT NULL GROUP BY 1, 2 HAVING COUNT(*) >= 5)
         |SELECT p.w AS w, p.w2 AS w2, CAST(p.cb AS BIGINT) AS n_pair,
         |  ROUND(LN(CAST(p.cb AS DOUBLE) * CAST(tot.t AS DOUBLE)
         |    / (CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE))), 6) AS pmi
         |FROM pairs p JOIN uni u1 ON u1.w = p.w
         |  JOIN uni u2 ON u2.w = p.w2 CROSS JOIN tot
         |ORDER BY pmi DESC, w, w2 LIMIT 30""".stripMargin,

    "text_textrank" ->
      s"""WITH tok AS (SELECT $toksSql AS t FROM documents),
         |inst AS (
         |  SELECT t[i] AS w1, t[i + 1] AS w2
         |  FROM tok, UNNEST(range(1, len(t))) AS u(i)),
         |canon AS (
         |  SELECT DISTINCT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b
         |  FROM inst WHERE w1 <> w2 AND w1 <> '' AND w2 <> ''),
         |edges AS (SELECT a AS src, b AS dst FROM canon
         |  UNION ALL SELECT b, a FROM canon),
         |${Graph.pagerankOracleCtes(5, 1000000000000L)}
         |SELECT node AS word, r AS rank_scaled FROM r5
         |ORDER BY rank_scaled DESC, word LIMIT 30""".stripMargin,

    "text_zipf" ->
      s"""WITH tok AS (
         |  SELECT lang, token FROM (SELECT lang, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)),
         |tc AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
         |ranked AS (
         |  SELECT lang, cnt, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rk
         |  FROM tc QUALIFY rk <= 300),
         |xy AS (
         |  SELECT lang,
         |    CAST(ROUND(ln(CAST(rk AS DOUBLE)), 6) AS DECIMAL(8,6)) AS x,
         |    CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(8,6)) AS y
         |  FROM ranked),
         |s AS (
         |  SELECT lang, COUNT(*) AS n_terms,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
         |  FROM xy GROUP BY lang),
         |r AS (
         |  SELECT *, CAST(n_terms AS DOUBLE) AS nn,
         |    (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
         |      / (CAST(n_terms AS DOUBLE) * sxx - sx * sx) AS slope_raw
         |  FROM s)
         |SELECT lang, n_terms, ROUND(slope_raw, 6) AS slope,
         |  ROUND((sy - slope_raw * sx) / nn, 6) AS intercept
         |FROM r ORDER BY lang""".stripMargin,

    "text_stats" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  ROUND(CAST(length(replace($normSql, ' ', '')) AS DOUBLE) / len($toksSql), 4) AS avg_tok_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  ROUND(CAST(${hitsSql("en")} AS DOUBLE) / len($toksSql), 4) AS stopword_ratio,
         |  ROUND(CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio,
         |  ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text), 4) AS digit_ratio,
         |  ROUND(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / length(text), 4) AS space_ratio,
         |  ROUND(least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0)
         |    * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)), 4) AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH scores AS (
         |  SELECT doc_id, lang AS labeled_lang, s.lang AS cand, s.hits FROM documents,
         |  UNNEST([${stopwords.keys.toSeq.sorted.map(l => s"{'lang': '$l', 'hits': ${hitsSql(l)}}").mkString(", ")}]) AS u(s))
         |SELECT doc_id, labeled_lang, cand AS pred_lang, CAST(hits AS BIGINT) AS hits FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand) AS rk
         |  FROM scores) t
         |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp,
         |  CAST(length($normSql) AS BIGINT) AS norm_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_surprise" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
         |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
         |  WHERE len(t) >= 2),
         |bgc AS (SELECT bg, COUNT(*) AS cnt_bg FROM bg GROUP BY 1),
         |pfc AS (SELECT w1, COUNT(*) AS cnt_pref FROM bg GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  ROUND(CAST(SUM(cnt_pref) AS DOUBLE) / SUM(cnt_bg), 4) AS surprise
         |FROM bg JOIN bgc USING (bg) JOIN pfc USING (w1)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all($normSql, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_rollinghash" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, length($normSql) + 1),
         |        i -> CAST(ascii(substr($normSql, i, 1)) AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS rhash
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_pii" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_longnum,
        |  (len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |   + len(regexp_extract_all(text, 'https?://[^ ]+'))
        |   + len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
        |   + len(regexp_extract_all(text, '[0-9]{7,}'))) > 0 AS has_pii
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_anonymize" ->
      """WITH red AS (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'),
        |          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g') AS r
        |  FROM documents)
        |SELECT doc_id,
        |  (len(regexp_extract_all(text, 'https?://[^ ]+'))
        |   + len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |   + len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
        |   + len(regexp_extract_all(text, '[0-9]{7,}'))) AS n_redacted,
        |  md5(r) AS redacted_md5,
        |  CAST(length(r) AS BIGINT) AS redacted_len
        |FROM red ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS bg
         |  FROM t, UNNEST(range(1, len(tk))) AS u(i)
         |  WHERE len(tk) >= 2),
         |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |agg AS (SELECT doc_id, SUM(c) AS n_bg, COUNT(*) AS n_dist_bg,
         |          MAX(c) AS top_bg FROM bgc GROUP BY 1)
         |SELECT t.doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  ROUND(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 4) AS dup_tok_frac,
         |  CAST(COALESCE(a.n_bg, 0) AS BIGINT) AS n_bigrams,
         |  ROUND(CASE WHEN a.n_bg IS NULL THEN 0.0
         |    ELSE 1.0 - CAST(a.n_dist_bg AS DOUBLE) / a.n_bg END, 4) AS dup_bigram_frac,
         |  ROUND(CASE WHEN a.n_bg IS NULL THEN 0.0
         |    ELSE CAST(a.top_bg AS DOUBLE) / a.n_bg END, 4) AS top_bigram_frac
         |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents)
         |SELECT doc_id,
         |  CAST((CAST(i AS BIGINT) - 1) / 20 AS BIGINT) AS chunk_idx,
         |  CAST(len(tk[CAST(i AS INT) : LEAST(CAST(i AS INT) + 29, len(tk))]) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(tk[CAST(i AS INT) : LEAST(CAST(i AS INT) + 29, len(tk))], ' ')) AS chunk_md5
         |FROM t, UNNEST(range(1, len(tk) + 1, 20)) AS u(i)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "text_readability" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CAST(len($toksSql) AS BIGINT) AS n_words,
         |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
         |    CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT) AS n_syllables
         |  FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, s FROM toks,
         |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |      ELSE [] END)) AS u(s)),
         |hot AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > 5),
         |tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         |hc AS (
         |  SELECT doc_id, COUNT(*) AS n_hot
         |  FROM sh WHERE s IN (SELECT s FROM hot) GROUP BY 1)
         |SELECT t.doc_id, t.n_sh, COALESCE(hc.n_hot, 0) AS n_hot,
         |  ROUND(CAST(COALESCE(hc.n_hot, 0) AS DOUBLE) / t.n_sh, 6) AS hot_share
         |FROM tot t LEFT JOIN hc ON hc.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "text_confusion" ->
      s"""WITH scores AS (
         |  SELECT doc_id, lang AS labeled_lang, s.lang AS cand, s.hits FROM documents,
         |  UNNEST([${stopwords.keys.toSeq.sorted.map(l => s"{'lang': '$l', 'hits': ${hitsSql(l)}}").mkString(", ")}]) AS u(s)),
         |pred AS (
         |  SELECT labeled_lang, cand AS pred_lang FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand) AS rk
         |    FROM scores) t
         |  WHERE rk = 1),
         |cm AS (SELECT labeled_lang, pred_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2)
         |SELECT labeled_lang, pred_lang, n,
         |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY labeled_lang), 6) AS share
         |FROM cm ORDER BY labeled_lang, pred_lang""".stripMargin,

    "text_topterms" ->
      s"""WITH tok AS (
         |  SELECT lang, token FROM (SELECT lang, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)
         |  WHERE length(token) >= 5),
         |tc AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
         |SELECT lang, token, cnt, rk FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rk
         |  FROM tc) t
         |WHERE rk <= 8 ORDER BY lang, rk""".stripMargin,

    "text_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, token FROM (SELECT doc_id, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)),
         |lens AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |            AVG(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
         |hits AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
         |  WHERE token IN ('merge', 'vector', 'window') GROUP BY 1, 2),
         |dfreq AS (SELECT token, COUNT(*) AS df FROM hits GROUP BY 1),
         |scored AS (
         |  SELECT h.doc_id,
         |    SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * (h.tf * 2.2) / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS score,
         |    COUNT(*) AS n_terms_hit
         |  FROM hits h
         |    JOIN lens l ON h.doc_id = l.doc_id
         |    JOIN dfreq d ON h.token = d.token
         |    CROSS JOIN stats s
         |  GROUP BY 1)
         |SELECT doc_id, ROUND(score, 4) AS bm25, n_terms_hit
         |FROM scored ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 20""".stripMargin,

    "text_hybrid" ->
      s"""WITH toks AS (
         |  SELECT doc_id, token FROM (SELECT doc_id, $toksSql AS t FROM documents),
         |    UNNEST(t) AS u(token)),
         |lens AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |            AVG(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
         |hits AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
         |  WHERE token IN ('merge', 'vector', 'window') GROUP BY 1, 2),
         |dfreq AS (SELECT token, COUNT(*) AS df FROM hits GROUP BY 1),
         |scored AS (
         |  SELECT h.doc_id,
         |    SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * (h.tf * 2.2) / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS score
         |  FROM hits h
         |    JOIN lens l ON h.doc_id = l.doc_id
         |    JOIN dfreq d ON h.token = d.token
         |    CROSS JOIN stats s
         |  GROUP BY 1),
         |bm_ranked AS (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
         |    ORDER BY ROUND(score, 4) DESC, doc_id) AS BIGINT) AS bm25_rank
         |  FROM scored ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 100),
         |cos_pairs AS (
         |  SELECT b.vec_id AS doc_id,
         |    ROUND(
         |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
         |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id = 7),
         |cos_ranked AS (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
         |    ORDER BY cos DESC, doc_id) AS BIGINT) AS cos_rank
         |  FROM cos_pairs ORDER BY cos DESC, doc_id LIMIT 100)
         |SELECT doc_id, bm25_rank, cos_rank,
         |  ROUND(COALESCE(1.0 / (60 + bm25_rank), 0.0)
         |      + COALESCE(1.0 / (60 + cos_rank), 0.0), 6) AS rrf
         |FROM bm_ranked FULL OUTER JOIN cos_ranked USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  )

  // The persisted-index path must return exactly what the inline path
  // returns, so it shares text_bm25's oracle verbatim; the incremental
  // entry runs the same SQL over the EDITED corpus (deletes applied,
  // updated docs re-texted) — stale postings or wrong segment liveness
  // change the ranking and fail the hash.
  val oraclesIndexed: Map[String, String] = Map(
    "text_bm25_index" -> oracles("text_bm25"),
    "text_bm25_incr" ->
      ("""WITH corpus AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' vector' ELSE text END AS text
         |  FROM documents WHERE doc_id % 13 <> 0),
         |""".stripMargin +
        oracles("text_bm25")
          .replaceFirst("\\AWITH ", "")
          .replace("FROM documents)", "FROM corpus)")))
}
