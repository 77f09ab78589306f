package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.functions.Fx._
import graft.sources.Tables

/** End-to-end corpus-cleaning pipeline — the composition a training-
  * data preparation run actually executes over a raw crawl: quality
  * gate → exact dedup → per-language corpus accounting. The point of
  * the operator (vs calling the stages separately) is the PLAN SHAPE:
  * every gate signal is computed in ONE narrow projection (no
  * self-joins of derived frames back onto the corpus — each would be
  * a shuffle at 100 TB), and the only wide operation in the whole
  * pipeline is the dedup hash partition, reused by the min-over-window
  * survivor pick without a second exchange.
  */
object Pipeline {

  /** CLUSTER-BALANCED corpus sampling — the semantic-diversity
    * curation step of training-data pipelines (SemDeDup / DataComp
    * cluster-then-cap): k-means the embedding space
    * ([[Similarity.kmeansCentroids]] — per-iteration one narrow pass +
    * a k-row reduce, vectors never shuffle, the driver holds k×dim
    * floats), assign every vector with one broadcast-argmax map
    * ([[Similarity.ivfAssignTo]]), then keep at most `quota` members
    * per cluster by PORTABLE hash rank — a heavy near-duplicate
    * cluster contributes `quota` rows, not its mass. The per-cluster
    * cap is `row_number ≤ quota`, which the graft TopKPerKey rule
    * rewrites to bounded per-group heaps — no full per-cluster sort at
    * 100 TB. Returns (vec_id, cell, rk). */
  def clusterBalancedSample(emb: DataFrame, k: Int, quota: Int,
      kmeansIters: Int = 3): DataFrame =
    clusterBalancedSampleFrom(
      Similarity.ivfAssignTo(emb, Similarity.kmeansCentroids(emb, k, kmeansIters))
        .select("vec_id", "cell"),
      quota)

  /** The cap half of [[clusterBalancedSample]] over a prebuilt
    * (vec_id, cell) assignment — reused by gates and by pipelines that
    * persist the clustering. */
  def clusterBalancedSampleFrom(assigned: DataFrame, quota: Int): DataFrame = {
    val w = Window.partitionBy("cell")
      .orderBy(md5(col("vec_id").cast(StringType)), col("vec_id"))
    assigned.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= quota)
      .select("vec_id", "cell", "rk")
  }

  /** SEMDEDUP — within-cluster semantic deduplication (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): k-means the embedding space, then
    * INSIDE each cluster drop every vector that has an
    * epsilon-cosine near-duplicate of lower portable rank (the
    * paper's upper-triangular rule: drop j when max_{i<j}
    * cos(i,j) ≥ 1−eps, with the portable (md5, id) rank standing in
    * for the index order so the result is engine-reproducible).
    * Where [[clusterBalancedSample]] caps cluster MASS, this prunes
    * cluster REDUNDANCY — a cluster of near-identical boilerplate
    * collapses to one survivor while a genuinely diverse cluster
    * keeps everything.
    *
    * Scale shape: candidates meet through the banded-hyperplane
    * kernel ([[Dedup.embBandKeys]]) SCOPED PER CLUSTER — the
    * equi-join key is (cell, band, band_hash), so two vectors are
    * only compared when the clustering already co-locates them;
    * exact cosine then re-joins the two id→vector sides. Every join
    * is an equi-join, nothing is all-pairs, vectors shuffle once per
    * side. Approximate by construction (a twin whose every band
    * misses survives — at near-dup thresholds the per-band match
    * rate is ≳0.99); the gate entry plants exact twins and checks
    * collapse. Returns the SURVIVORS as (vec_id, cell). */
  def semanticDedup(emb: DataFrame, k: Int, eps: Double,
      kmeansIters: Int = 3, bands: Int = 4,
      targetBucket: Long = 32L): DataFrame =
    semanticDedupFrom(emb,
      Similarity.ivfAssignTo(emb, Similarity.kmeansCentroids(emb, k, kmeansIters))
        .select("vec_id", "cell"),
      eps, bands, targetBucket)

  /** [[semanticDedup]] over a prebuilt (vec_id, cell) assignment —
    * pipelines that persist the clustering (or reuse an IVF index's
    * cells) prune without re-clustering. */
  def semanticDedupFrom(emb: DataFrame, assigned: DataFrame, eps: Double,
      bands: Int = 4, targetBucket: Long = 32L): DataFrame = {
    require(eps > 0.0 && eps < 1.0, s"semanticDedup: eps must be in (0,1), got $eps")
    val threshold = 1.0 - eps
    val planes = bands * Dedup.autoBandBits(emb.count(), targetBucket)
    val cellsA = assigned.select(col("vec_id").as("vec_a"), col("cell").as("cell_a"))
    val cellsB = assigned.select(col("vec_id").as("vec_b"), col("cell").as("cell_b"))
    // banded candidates, cluster-scoped: same (cell, band, hash)
    val aK = Dedup.embBandKeys(emb, planes, bands, "vec_a", "band_a", "hash_a")
      .join(cellsA, "vec_a")
    val bK = Dedup.embBandKeys(emb, planes, bands, "vec_b", "band_b", "hash_b")
      .join(cellsB, "vec_b")
    val cands = aK.join(bK,
        col("cell_a") === col("cell_b") && col("band_a") === col("band_b")
          && col("hash_a") === col("hash_b") && col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val ea = Similarity.withNorm(emb).select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val eb = Similarity.withNorm(emb).select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("norm").as("norm_b"))
    val pairs = cands.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b"))).as("cos"))
      .filter(col("cos") >= threshold)
    // drop the HIGHER portable-rank end of every in-epsilon pair
    // (upper-triangular SemDeDup under the portable order); the
    // lowest-rank member of any epsilon-ball has no lower neighbor
    // and always survives, so no cluster empties
    def rk(id: Column) = md5(id.cast(StringType))
    val dropped = pairs
      .select(when(rk(col("vec_a")) < rk(col("vec_b"))
          || (rk(col("vec_a")) === rk(col("vec_b")) && col("vec_a") < col("vec_b")),
        col("vec_b")).otherwise(col("vec_a")).as("vec_id"))
      .distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti").select("vec_id", "cell")
  }

  /** The narrow half of [[cleanCorpus]]: quality-gate signals + content
    * hash in one projection, no shuffle. Split out so the incremental
    * path ([[incrementalClean]]) can re-gate ONLY a delta. */
  def cleanCorpusGate(docs: DataFrame, minTokens: Int, maxDigitRatio: Double): DataFrame = {
    val nChars = length(col("text"))
    val nDigit = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
      .withColumn("digit_ratio", round(nDigit.cast(DoubleType) / nChars, 4))
      .filter(col("n_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio)
      .withColumn("text_hash", md5(normText(col("text"))))
  }

  /** Gate + dedup + survivor marking, one row per gated doc:
    * `keep` marks the canonical survivor (lowest doc_id) of each
    * normalized-content group. */
  def cleanCorpus(docs: DataFrame, minTokens: Int, maxDigitRatio: Double): DataFrame = {
    val gated = cleanCorpusGate(docs, minTokens, maxDigitRatio)
    // survivor = lowest doc_id in the content group; min-over-window
    // needs no ordered sort buffer (running min), one shuffle total
    val keepId = min(col("doc_id")).over(Window.partitionBy("text_hash"))
    gated.withColumn("keep", col("doc_id") === keepId)
  }

  /** Incremental reclean over a CDC delta (SnapshotStore.diff shape:
    * the current-version columns + a `change_type` of
    * insert/update/delete) — the daily-ingest composition: instead of
    * re-gating the corpus, the expensive narrow pass (tokenize, regex
    * ratios, md5) runs over the DELTA ONLY, and survivor flags are
    * recomputed only for content groups the delta actually touched.
    *
    * `prior` is the previous [[cleanCorpus]] output (the carried dedup
    * state: every gated doc with its text_hash and keep flag).
    * Result is row-identical to a full `cleanCorpus` of the updated
    * corpus (spec-proven): dedup state composes because exact-dup
    * groups are independent — only groups gaining or losing a member
    * can change their survivor.
    *
    * Shuffle shape at 100 TB: gating is O(|delta|) narrow; `touched`
    * is ≤ |delta| hashes (broadcast-able); the prior state pays two
    * hash-key joins against that small set and the survivor window
    * runs over affected groups only — the unaffected bulk of the
    * corpus state streams through untouched with no window and no
    * re-hash. */
  def incrementalClean(prior: DataFrame, changes: DataFrame,
      minTokens: Int, maxDigitRatio: Double): DataFrame = {
    val inserts = changes.filter(col("change_type").isin("insert", "update")).drop("change_type")
    val removedKeys = changes.filter(col("change_type").isin("delete", "update"))
      .select("doc_id")
    // prior rows untouched by the delta (updates re-enter via the gate)
    val surviving = prior.join(removedKeys, Seq("doc_id"), "left_anti")
    // the ONLY re-gating in the incremental path: O(|delta|)
    val gatedDelta = cleanCorpusGate(inserts, minTokens, maxDigitRatio)
    // content groups whose membership changed: gained a gated delta row
    // or lost a removed/updated prior row
    val touched = gatedDelta.select("text_hash")
      .union(prior.join(removedKeys, Seq("doc_id"), "left_semi").select("text_hash"))
      .distinct()
    val untouched = surviving.join(touched, Seq("text_hash"), "left_anti")
    val recompute = surviving.drop("keep").join(touched, Seq("text_hash"), "left_semi")
      .unionByName(gatedDelta)
    val keepId = min(col("doc_id")).over(Window.partitionBy("text_hash"))
    untouched.unionByName(recompute.withColumn("keep", col("doc_id") === keepId))
  }

  /** Per-language corpus accounting after [[cleanCorpus]]: surviving
    * docs, removed duplicates, total surviving tokens. */
  def corpusReport(cleaned: DataFrame): DataFrame =
    cleaned.groupBy("lang")
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dups"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("n_tokens"))

  /** Deterministic stratified sampling — the corpus-rebalancing step a
    * training-data mixture needs (downsample an over-represented
    * language/source, keep the rest). Membership is decided by a
    * PORTABLE hash of the document id (first 4 hex chars of md5 → a
    * uniform value in [0, 10000)), NOT by `rand()`: the sample is
    * reproducible across runs, engines (oracle-checkable in DuckDB)
    * and cluster sizes, and adding documents never flips membership of
    * existing ones — the property that keeps incremental pipeline runs
    * consistent with backfills. One narrow filter, no shuffle.
    *
    * `rates`: per-stratum keep-rate in basis points of 10000 (e.g.
    * "en" -> 5000 keeps ~50% of English docs); strata absent from the
    * map keep `defaultRate`. */
  def sampleStratified(docs: DataFrame, stratumCol: String,
      rates: Map[String, Int], defaultRate: Int = 10000): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast(LongType) % 10000
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  /** Deterministic WEIGHTED sampling — keep probability proportional
    * to a per-row weight in [0, 1] (clamped): the quality-upsampling /
    * noise-downsampling move a training mixture makes, with the same
    * portability contract as [[sampleStratified]] (membership from the
    * md5 bucket of doc_id, not rand() — reproducible across engines
    * and appends; raising a doc's weight can only ADD it, never flip
    * others). One narrow filter, no shuffle.
    *
    * The raw 16-bit bucket compares against w·65536 directly — NOT
    * reduced mod 10⁴ first, which would bias low residues (7/65536 vs
    * 6/65536 occurrence, up to ~7% relative keep-rate skew at w=0.5). */
  def sampleWeighted(docs: DataFrame, weight: Column): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast(LongType)
    val w = least(greatest(weight, lit(0.0)), lit(1.0))
    docs.filter(bucket.cast(DoubleType) < w * 65536.0)
  }

  /** Deterministic train/validation/test split — the dataset-card
    * staple, under the SAME portability contract as
    * [[sampleStratified]]: assignment comes from the doc_id's md5
    * bucket, so it is reproducible across engines and runs, stable
    * under appends (new docs never move old ones between splits), and
    * family-safe (all engines agree doc-for-doc, so a doc can never
    * train in one run and evaluate in another). `valBp`/`testBp` are
    * basis points of 65536; everything else is train. Buckets
    * partition exactly — the three splits are disjoint and
    * exhaustive by construction. One narrow projection, no shuffle. */
  def assignSplit(docs: DataFrame, valBp: Int = 3277, testBp: Int = 3277): DataFrame = {
    require(valBp >= 0 && testBp >= 0 && valBp + testBp <= 65536,
      s"split fractions valBp=$valBp testBp=$testBp must fit in 65536")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast(LongType)
    docs.withColumn("split",
      when(bucket < valBp, "val")
        .when(bucket < valBp + testBp, "test")
        .otherwise("train"))
  }

  /** K-fold cross-validation assignment — [[assignSplit]]'s CV twin:
    * fold = a uniform bucket of the PORTABLE md5 of the id (never a
    * Spark-internal hash — resplitting on another engine must
    * reproduce the folds bit-for-bit), so assignment is deterministic,
    * append-stable (a new doc never moves an old one), and
    * join-free at any scale. 2^16 md5 buckets spread mod `k`; buckets
    * mod k is within ±1 bucket of exactly uniform, and bucket→fold is
    * stable as k stays fixed. */
  def assignFolds(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"need 2 <= k <= 65536 folds, got $k")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast(LongType)
    docs.withColumn("fold", bucket % k)
  }

  /** Deterministic class-balancing OVERSAMPLING — the minority-class
    * replication step of training-mix construction: every class is
    * brought up to the majority class's count in expectation, with
    * copies = ⌊t/c⌋ plus one more iff bucket·c < (t mod c)·2¹⁶ over
    * the PORTABLE md5 bucket — pure integer arithmetic end-to-end, so
    * the replication set is exact, append-stable, and reproducible on
    * any engine (no RNG, no doubles). The per-class factor frame is
    * |classes| rows (broadcast); the explode fans each row to its copy
    * count — one narrow generator, no shuffle of payloads. */
  def oversampleBalanced(docs: DataFrame, classCol: String): DataFrame = {
    val counts = docs.groupBy(classCol).agg(count(lit(1)).as("__c"))
    val target = counts.agg(max(col("__c")).as("__t"))
    val factors = counts.crossJoin(broadcast(target))
    docs.join(broadcast(factors), classCol)
      .withColumn("__bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast(LongType))
      .withColumn("__n", expr("__t div __c")
        + when(col("__bucket") * col("__c") < (col("__t") % col("__c")) * 65536L, 1L)
          .otherwise(0L))
      .select(col("doc_id"), col(classCol),
        explode(sequence(lit(1L), col("__n"))).as("copy"))
  }

  /** Benchmark decontamination — the pre-training gate that keeps
    * evaluation data out of the training corpus: a training document is
    * contaminated when it shares at least `minOverlap` word k-shingles
    * with ANY document of the benchmark set. Returns (doc_id,
    * n_overlap) for contaminated training docs, where n_overlap =
    * |S_k(doc) ∩ S_k(benchmark corpus)| — the evidence count an audit
    * needs, not just a flag.
    *
    * Scale shape: the benchmark side collapses to a DISTINCT shingle
    * SET before the join, so each training (doc, shingle) row matches
    * at most once — join output is bounded by the training shingle
    * count, never quadratic, and needs no df-cap (a boilerplate shingle
    * appears once in the set). Benchmark suites are tiny relative to a
    * 100 TB corpus (10⁴–10⁶ shingles), so the join plans as a broadcast
    * under AQE; the training side is one narrow shingling flatMap + a
    * map-side-combinable per-doc count. At production scale use k of
    * 8–13 (the GPT-3/PaLM decontamination range) so common-phrase
    * collisions vanish; the tiny test corpus uses k=3. */
  def decontaminate(train: DataFrame, bench: DataFrame, k: Int, minOverlap: Int): DataFrame = {
    val benchSet = Dedup.docShingles(bench, k).select("shingle").distinct()
    Dedup.docShingles(train, k)
      .join(benchSet, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Per-stratum token budgeting — "take the best documents of each
    * language until its token budget is spent", the mixture-shaping
    * step after cleaning. Docs are ranked inside their stratum by
    * (quality desc, doc_id) and kept while the RUNNING token total
    * (including the doc itself) fits the budget: a greedy prefix, so
    * the output is deterministic and insensitive to partitioning. One
    * window (= one shuffle on the stratum key) over an already-narrow
    * projection; at 100 TB the stratum count is small and the window
    * is a running sum — no per-group buffering. */
  def tokenBudget(cleaned: DataFrame, stratumCol: String, budget: Long,
      qualityCol: String = "n_tokens"): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(qualityCol).desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cleaned
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Sequence packing — the data-loader step that concatenates cleaned
    * docs into fixed token-budget training sequences: docs pack in
    * deterministic doc_id order per stratum, and a doc belongs to the
    * sequence its FIRST token lands in (greedy sequential chunking —
    * stable under appends and reproducible across engines and
    * partitionings, unlike bin-packing heuristics whose output depends
    * on visit order). seq_id = (running token total before the doc)
    * DIV seqTokens — pure integer math, one running-sum window per
    * stratum, no per-group buffering. */
  def packSequences(cleaned: DataFrame, stratumCol: String, seqTokens: Long): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cleaned
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr(s"(cum_end - n_tokens) DIV $seqTokens"))
  }

  /** Deterministic curriculum interleaving — the mixture-ORDER step
    * after sampling/budgeting: strata emit documents proportionally to
    * integer weights (en:3, de:1 → the stream cycles en,en,en,de,…) by
    * sorting on an exact INTEGER phase: the k-th doc of a weight-w
    * stratum sits at phase (k−1)·(L/w) with L = lcm(weights), so every
    * prefix of the global order holds strata ≈ in ratio w. No floats
    * anywhere (reproducible across engines/partitionings); ties break
    * (phase, stratum, doc_id). One per-stratum window; consuming a
    * prefix is a distributed TakeOrdered, and a full materialization
    * is the same range-partitioned sort any ordered write pays. */
  def interleaveByWeight(docs: DataFrame, stratumCol: String,
      weights: Map[String, Int], defaultWeight: Int = 1): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 1), "weights must be >= 1")
    val lcm = (defaultWeight +: weights.values.toSeq)
      .map(BigInt(_)).reduce((a, b) => a * b / a.gcd(b)).toLong
    val wt = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, v)) =>
      when(col(stratumCol) === s, lit(v)).otherwise(acc)
    }
    val byStratum = Window.partitionBy(stratumCol).orderBy("doc_id")
    docs
      .withColumn("rk", row_number().over(byStratum).cast(LongType))
      .withColumn("__w", wt.cast(LongType))
      // integer DIV keeps the phase a BIGINT (plain `/` would go double)
      .withColumn("phase", expr(s"(rk - 1) * ($lcm DIV __w)"))
      .drop("__w")
  }

  /** Training-mixture report: per (source, lang) cell, docs, exact
    * token count, and the cell's share of corpus docs/tokens — the
    * table a sampling policy (pipe_sample_weighted, pipe_budget) is
    * tuned against, and the first thing to diff when a new crawl
    * snapshot shifts the corpus mix. One map-side-combinable
    * aggregate; shares normalize against a broadcast one-row total,
    * so nothing ever sorts or windows the |sources|×|langs| frame. */
  def sourceMix(docs: DataFrame): DataFrame = {
    val agg = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast(LongType)).as("n_tokens"))
    val tot = agg.agg(sum("n_docs").as("__td"), sum("n_tokens").as("__tt"))
    agg.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast(DoubleType) / col("__td"), 6).as("doc_share"),
        round(col("n_tokens").cast(DoubleType) / col("__tt"), 6).as("token_share"))
  }

  /** Per-source quota cap — the domain-balancing primitive: no source
    * may contribute more than `k` docs, survivors chosen by portable
    * md5(doc_id) order (reproducible on any engine, stable under
    * corpus append for already-kept docs below the cap boundary). The
    * row_number + `<= k` filter rewrites to TopKPerKeyExec (a k-heap
    * per source — no per-source sort of the full corpus), so the cap
    * costs one shuffle on source at any corpus size. */
  def sourceQuota(docs: DataFrame, k: Int): DataFrame = {
    // Rank on a NARROW (doc_id, source, md5) projection so the
    // row_number + `<= k` filter rewrites to TopKPerKeyExec — a k-heap
    // per source over ~48-byte rows, never a per-source sort of the
    // full corpus. The keep set is ≤ k·|sources| rows → broadcast back
    // onto the wide frame.
    val w = Window.partitionBy("source")
      .orderBy(col("__ord"), col("doc_id"))
    val keep = docs
      .select(col("doc_id"), col("source"), md5(col("doc_id").cast("string")).as("__ord"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select("doc_id", "rk")
    docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
      .join(broadcast(keep), Seq("doc_id"), "left")
      .withColumn("kept", col("rk").isNotNull)
  }

  /** Curriculum staging: bucket docs into 5 quality bands (the
    * low→high ordering a curriculum-training run feeds batches in)
    * using the same quality score surfaced by TextAnalysis.quality —
    * fixed thresholds (floor(score·5)), NOT a global ntile sort, so
    * band assignment is embarrassingly parallel and stable as the
    * corpus grows. Exact decimal mean keeps avg hash-portable. */
  def curriculum(docs: DataFrame): DataFrame = {
    val nTok = size(tokens(col("text")))
    val nChars = length(col("text"))
    val nDigit = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val score = round(least(nTok.cast(DoubleType) / 100.0, lit(1.0))
      * (lit(1.0) - nDigit.cast(DoubleType) / nChars), 4)
    docs
      .withColumn("q", score)
      .withColumn("stage", least(floor(col("q") * 5), lit(4L)).cast(LongType))
      .withColumn("n_tokens", nTok.cast(LongType))
  }

  /** Mixture planning by WATER-FILLING: given target mixture weights
    * per source and a total token budget, the exact optimal
    * allocation alloc_s = min(avail_s, r·w_s) with r solving
    * Σ alloc = budget — sources too small to meet their target share
    * saturate, and their shortfall redistributes to the rest in
    * weight proportion (the iterative redistribution has this closed
    * form: sort by avail/w, r = (budget − Σ_sat avail)/(Σ_unsat w) at
    * the unique prefix where it lands below the next ratio). One
    * token-count aggregate over the corpus; the solve runs on the
    * |sources|-row frame (single-partition window over ~dozens of
    * rows — the bounded-frame device). */
  def mixturePlan(docs: DataFrame, weights: Map[String, Double], budget: Long): DataFrame = {
    val wSum = weights.values.sum
    require(wSum > 0, "weights must sum positive")
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col("source") === s, lit(w / wSum)).otherwise(acc)
    }
    val avail = docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
      .groupBy("source").agg(sum(col("n_tokens")).as("avail"))
      .withColumn("w", wCol)
      .filter(col("w") > 0)
    val byRatio = Window.orderBy(col("ratio"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frame = avail
      .withColumn("ratio", col("avail").cast(DoubleType) / col("w"))
      .withColumn("cumA", coalesce(sum(col("avail")).over(
        Window.orderBy(col("ratio"), col("source")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("cumW", coalesce(sum(col("w")).over(byRatio), lit(0.0)))
    // Σw = 1 by normalization — the LITERAL 1.0, never a float
    // re-aggregation of the weights (a tree-summed double is not
    // reproducible across engines; the running cumW IS, because both
    // engines evaluate an ordered window sum linearly).
    // A prefix's candidate is VALID only if that prefix really
    // saturates under it: prev_ratio ≤ rCand < own ratio — without the
    // lower bound a later row's candidate (computed assuming rows it
    // would NOT saturate are saturated) sneaks under the min.
    val rStar = frame
      .withColumn("prev_ratio", coalesce(
        lag(col("ratio"), 1).over(Window.orderBy(col("ratio"), col("source"))), lit(0.0)))
      .withColumn("rCand", (lit(budget.toDouble) - col("cumA").cast(DoubleType))
        / (lit(1.0) - col("cumW")))
      .agg(min(when(col("rCand") < col("ratio") && col("rCand") >= col("prev_ratio"),
        col("rCand"))).as("r"))
    frame.crossJoin(broadcast(rStar))
      .select(col("source"), col("avail"),
        round(col("w"), 6).as("target_share"),
        when(col("r").isNull, col("avail"))
          .otherwise(least(col("avail"), floor(col("r") * col("w")).cast(LongType)))
          .as("alloc"))
      .withColumn("rate", round(col("alloc").cast(DoubleType) / col("avail"), 6))
      .withColumn("saturated", col("alloc") === col("avail"))
  }

  /** One-pass dataset card — the summary table a dataset release
    * prints: corpus size, token mass, language/source breadth, exact
    * duplicate rate, mean quality, mean doc length, in LONG format
    * (metric, value). Every signal computes in ONE narrow projection
    * + ONE aggregate (multi-distinct plans via Expand — no per-metric
    * jobs, the dq_profile discipline); quality means go through exact
    * decimal sums. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val nTok = size(tokens(col("text"))).cast(LongType)
    val nChars = length(col("text"))
    val nDigit = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val q = round(least(nTok.cast(DoubleType) / 100.0, lit(1.0))
      * (lit(1.0) - nDigit.cast(DoubleType) / nChars), 4)
    val a = docs.select(col("lang"), col("source"), nTok.as("nt"),
        md5(normText(col("text"))).as("h"), q.as("q"))
      .agg(count(lit(1)).as("nd"), sum(col("nt")).as("st"),
        countDistinct(col("lang")).as("nl"),
        countDistinct(col("source")).as("ns"),
        countDistinct(col("h")).as("nh"),
        sum(col("q").cast(DecimalType(12, 4))).as("sq"))
    def m(name: String, v: Column) = struct(lit(name).as("metric"), v.as("value"))
    a.select(explode(array(
        m("n_docs", col("nd").cast(DoubleType)),
        m("n_tokens", col("st").cast(DoubleType)),
        m("n_langs", col("nl").cast(DoubleType)),
        m("n_sources", col("ns").cast(DoubleType)),
        m("dup_rate", round((col("nd") - col("nh")).cast(DoubleType) / col("nd"), 6)),
        m("mean_quality", round(col("sq").cast(DoubleType) / col("nd"), 6)),
        m("mean_doc_tokens", round(col("st").cast(DoubleType) / col("nd"), 6))
      )).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_dataset_card" -> { (s, d) =>
      datasetCard(Tables.documents(s, d)).orderBy("metric")
    },

    "pipe_mixture_plan" -> { (s, d) =>
      // Uniform target mixture over all 20 sources, budget 40k tokens:
      // small sources saturate, the shortfall water-fills the rest.
      val srcs = (Tables.documents(s, d).select("source").distinct()
        .collect().map(_.getString(0))) // |sources| rows, metadata-sized
      mixturePlan(Tables.documents(s, d),
        srcs.map(_ -> 1.0).toMap, 40000L).orderBy("source")
    },

    "pipe_quota" -> { (s, d) =>
      // Cap every source at 20 docs; report what the cap kept/cut and
      // the token mass surviving per source.
      sourceQuota(Tables.documents(s, d), 20)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tok_kept"))
        .orderBy("source")
    },

    "pipe_curriculum" -> { (s, d) =>
      // Quality-band curriculum report: docs/tokens + mean quality per
      // stage (0 = lowest quality band, 4 = highest).
      curriculum(Tables.documents(s, d))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(sum(col("q").cast(DecimalType(8, 4))).cast(DoubleType) / count(lit(1)), 4)
            .as("avg_quality"))
        .orderBy("stage")
    },

    "pipe_clean" -> { (s, d) =>
      corpusReport(cleanCorpus(Tables.documents(s, d), 10, 0.3)).orderBy("lang")
    },

    "pipe_source_mix" -> { (s, d) =>
      sourceMix(Tables.documents(s, d)).orderBy("source", "lang")
    },

    "pipe_clean_incr" -> { (s, d) =>
      // Daily-ingest shape: yesterday's corpus is modeled as a
      // deterministic perturbation of today's (inserts = keys ≡ 3 mod
      // 7 were absent; updates = keys ≡ 0 mod 11 had stale text;
      // deletes = synthetic obsolete docs), yesterday's cleaned state
      // is carried, and ONLY the CDC delta re-gates. The oracle is the
      // FULL reclean of today's corpus — identical output is the whole
      // point of the incremental path.
      val cur = Tables.documents(s, d)
      val isInsert = col("doc_id") % 7 === 3
      val isUpdate = col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 3
      val deleted = cur.filter(col("doc_id") % 13 === 5)
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .withColumn("text", concat(lit("obsolete draft "), col("text")))
      val prev = cur.filter(!isInsert)
        .withColumn("text",
          when(isUpdate, concat(col("text"), lit(" stale 12345 67890"))).otherwise(col("text")))
        .unionByName(deleted)
      val changes = cur.filter(isInsert).withColumn("change_type", lit("insert"))
        .unionByName(cur.filter(isUpdate).withColumn("change_type", lit("update")))
        .unionByName(deleted.withColumn("change_type", lit("delete")))
      corpusReport(incrementalClean(cleanCorpus(prev, 10, 0.3), changes, 10, 0.3))
        .orderBy("lang")
    },

    "pipe_oversample" -> { (s, d) =>
      // Balance languages to the majority count; the oracle replays
      // every integer replication decision doc-for-doc.
      oversampleBalanced(Tables.documents(s, d), "lang")
        .orderBy("doc_id", "copy")
    },

    "pipe_kfold" -> { (s, d) =>
      // 5-fold CV assignment profile (per-(fold, lang) docs/chars):
      // the oracle reproduces every doc's fold from portable md5.
      assignFolds(Tables.documents(s, d), 5)
        .groupBy("fold", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("fold", "lang")
    },

    "pipe_epoch_shuffle" -> { (s, d) =>
      // Deterministic multi-epoch shuffle: epoch e re-orders the
      // corpus by portable md5(doc_id || ':' || e) — a DIFFERENT but
      // reproducible permutation per epoch (no epoch sees the other's
      // order), append-stable (a new doc inserts without moving any
      // existing pair), and engine-portable (the oracle rebuilds every
      // assignment doc-for-doc). No global sort at scale: the
      // permutation IS the (shard, ord) key pair — writers consume the
      // 8 shard streams independently and sort only within a shard
      // file, the same discipline as pipe_pack's packing keys.
      val h = md5(concat(col("doc_id").cast(StringType), lit(":"),
        col("epoch").cast(StringType)))
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array((0 until 3).map(e => lit(e.toLong)): _*)).as("epoch"))
        .withColumn("h", h)
        .select(col("doc_id"), col("epoch"),
          (conv(substring(col("h"), 1, 4), 16, 10).cast(LongType) % 8).as("shard"),
          conv(substring(col("h"), 1, 12), 16, 10).cast(LongType).as("ord"))
        .orderBy("epoch", "doc_id")
    },

    "pipe_split" -> { (s, d) =>
      // Deterministic ~5%/5%/90% val/test/train split, reported as the
      // per-(split, lang) doc/char profile a dataset card prints.
      // Portable md5 buckets → the oracle reproduces the assignment
      // doc-for-doc; disjoint + exhaustive by construction.
      assignSplit(Tables.documents(s, d), valBp = 3277, testBp = 3277)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("split", "lang")
    },

    "pipe_cluster_sample" -> { (s, d) =>
      // CLUSTER-BALANCED corpus sample (the SemDeDup/DataComp-style
      // semantic-diversity curation step): k-means the embedding space
      // (driver holds k×dim centroids only), assign every vector in
      // ONE narrow broadcast-argmax map, keep at most `quota` members
      // per cluster by portable hash rank — heavy clusters can't
      // dominate the mixture. row_number ≤ quota plans through the
      // graft TopKPerKey rewrite (bounded per-group heaps). Cluster
      // ASSIGNMENT is deterministic but impl-defined (Lloyd's over
      // float sums) → rows-only; pipe_cluster_gate hash-checks the
      // invariants.
      clusterBalancedSample(Tables.embeddings(s, d), k = 8, quota = 40)
        .orderBy("cell", "rk")
    },

    "pipe_cluster_gate" -> { (s, d) =>
      // The hash-checked gate behind pipe_cluster_sample: quota bound,
      // exact-fill of over-quota clusters, total = Σ min(quota, |c|),
      // cluster coverage, and sample-id referential integrity — every
      // invariant of cluster-balanced sampling that is declaratively
      // checkable without reproducing the clustering.
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.kmeansCentroids(emb, 8, 3)
      val assigned = Similarity.ivfAssignTo(emb, cents)
        .select("vec_id", "cell").materialize()
      val sample = clusterBalancedSampleFrom(assigned, quota = 40).materialize()
      val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .materialize()
      val expected = sizes.agg(sum(least(col("n"), lit(40L)))).head().getLong(0)
      val perCell = sample.groupBy("cell").agg(count(lit(1)).as("sn"))
        .join(sizes, Seq("cell"))
      val quotaOk = perCell.filter(col("sn") > 40).limit(1).count() == 0
      val fullOk = perCell.filter(col("n") >= 40 && col("sn") =!= 40)
        .limit(1).count() == 0
      val coverageOk = perCell.count() == sizes.count()
      val totalOk = sample.count() == expected
      val idsOk = sample.select("vec_id").distinct().count() == sample.count() &&
        sample.join(emb.select("vec_id"), Seq("vec_id"), "left_anti")
          .limit(1).count() == 0
      s.range(1).select(lit(8L).as("k"), lit(40L).as("quota"),
        lit(quotaOk).as("quota_ok"), lit(fullOk).as("full_ok"),
        lit(coverageOk).as("coverage_ok"), lit(totalOk).as("total_ok"),
        lit(idsOk).as("ids_ok"))
    },

    "pipe_semdedup" -> { (s, d) =>
      // SEMDEDUP survivors over the embeddings table + planted exact
      // twins (scaled copies: cosine exactly 1.0 > 1 − eps): k-means
      // clusters, then within-cluster epsilon-ball pruning keeps the
      // lowest-portable-rank member per ball. Cluster assignment is
      // deterministic but impl-defined (Lloyd's over float sums) →
      // rows-only; pipe_semdedup_gate hash-checks the invariants.
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val twins = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      semanticDedup(emb.unionByName(twins), k = 8, eps = 0.001)
        .orderBy("vec_id")
    },

    "pipe_semdedup_gate" -> { (s, d) =>
      // The hash-checked gate behind pipe_semdedup: every planted twin
      // pair collapses to EXACTLY one survivor, untouched vectors all
      // survive (this corpus holds no organic 0.999-cosine pair — max
      // is ~0.51), every cluster keeps at least one survivor, survivor
      // ids are unique and referential, and NO two survivors in the
      // same cluster sit within epsilon of each other (the exact
      // declarative recheck over the survivor set).
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val twins = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val all = emb.unionByName(twins).materialize()
      val assigned = Similarity.ivfAssignTo(all,
          Similarity.kmeansCentroids(all, 8, 3))
        .select("vec_id", "cell").materialize()
      val surv = semanticDedupFrom(all, assigned, eps = 0.001).materialize()
      val sIds = surv.select("vec_id")
      val planted = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
        .materialize()
      val nPlanted = planted.count()
      val origAlive = planted.join(sIds, Seq("vec_id"), "left_semi")
      val twinAlive = planted
        .select((col("vec_id") + 1000000L).as("vec_id"))
        .join(sIds, Seq("vec_id"), "left_semi")
        .select((col("vec_id") - 1000000L).as("vec_id"))
      val collapsedOk = origAlive.join(twinAlive, Seq("vec_id"), "left_semi")
        .limit(1).count() == 0
      val oneSurvivorOk =
        origAlive.count() + twinAlive.count() == nPlanted && collapsedOk
      val othersOk = emb.filter(col("vec_id") % 10 =!= 0).select("vec_id")
        .join(sIds, Seq("vec_id"), "left_anti").limit(1).count() == 0
      val cellsOk = surv.select("cell").distinct().count() ==
        assigned.select("cell").distinct().count()
      val idsOk = sIds.distinct().count() == surv.count() &&
        sIds.join(all.select("vec_id"), Seq("vec_id"), "left_anti")
          .limit(1).count() == 0
      // exact post-condition: no surviving in-cell pair within epsilon
      // (sides renamed disjointly off the checkpointed survivor frame;
      // the join is an equi-join on the cell)
      val sv = surv.join(all, Seq("vec_id")).materialize()
      val lhs = sv.select(col("vec_id").as("vl"), col("cell").as("cl"),
        col("embedding").as("el"))
      val rhs = sv.select(col("vec_id").as("vr"), col("cell").as("cr"),
        col("embedding").as("er"))
      val close = lhs.join(rhs, col("cl") === col("cr") && col("vl") < col("vr"))
        .filter(dot(col("el"), col("er"))
          / (l2norm(col("el")) * l2norm(col("er"))) >= 0.999)
      val noClosePairOk = close.limit(1).count() == 0
      s.range(1).select(lit(nPlanted).as("n_planted"),
        lit(collapsedOk).as("collapsed_ok"),
        lit(oneSurvivorOk).as("one_survivor_ok"),
        lit(othersOk).as("others_ok"), lit(cellsOk).as("cells_ok"),
        lit(idsOk).as("ids_ok"), lit(noClosePairOk).as("no_close_pair_ok"))
    },

    "pipe_sample" -> { (s, d) =>
      // Rebalance the cleaned corpus: keep ~35% of 'en' survivors,
      // everything else untouched; report the mixture. Deterministic
      // (portable md5 bucket), so the oracle reproduces it exactly.
      val kept = sampleStratified(
        cleanCorpus(Tables.documents(s, d), 10, 0.3).filter(col("keep")),
        "lang", Map("en" -> 3500))
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang")
    },

    "pipe_sample_weighted" -> { (s, d) =>
      // Quality-weighted mixture: keep probability rises with doc
      // length (capped at 1.0 past 300 chars); report the resulting
      // per-language mixture. Portable md5 bucket → oracle-exact.
      sampleWeighted(Tables.documents(s, d),
        least(col("n_chars").cast(DoubleType) / lit(300.0), lit(1.0)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    },

    "pipe_sample_k" -> { (s, d) =>
      // EXACT-k stratified sample (companion to pipe_sample's rate
      // form): per language, the k=20 docs with the smallest portable
      // hash rank — reproducible across engines/runs, and the
      // row_number ≤ k filter is rewritten to TopKPerKeyExec by the
      // graft rule (bounded per-group heaps, no full per-group sort).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("hb"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("hb"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select("lang", "rk", "doc_id")
        .orderBy("lang", "rk")
    },

    "pipe_budget" -> { (s, d) =>
      // Token-budgeted mixture: per language, greedily keep the
      // longest surviving docs until a 2000-token budget is spent.
      val kept = tokenBudget(
        cleanCorpus(Tables.documents(s, d), 10, 0.3).filter(col("keep")),
        "lang", 2000L)
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang")
    },

    "pipe_budget_bpe" -> { (s, d) =>
      // TOKEN-ACCURATE budgeting: the budget counts BPE PIECES from
      // the trained encoder (TextAnalysis.bpeEncode over the learned
      // rank-1 vocabulary — the rank the oracle can replay in SQL),
      // not whitespace tokens: the number a training run actually
      // pays for. Same greedy keep-longest-until-spent shape as
      // pipe_budget, stratified by language; the encode is a narrow
      // broadcast map, the budget one per-language window.
      val docs = Tables.documents(s, d)
      val enc = TextAnalysis.bpeEncode(docs, TextAnalysis.learnBpeMerges(docs, 1))
      val withLang = docs.select(col("doc_id"), col("lang"))
        .join(enc.withColumnRenamed("n_bpe_pieces", "n_tokens")
          .select("doc_id", "n_tokens"), Seq("doc_id"))
      tokenBudget(withLang, "lang", 4000L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang")
    },

    "pipe_pack" -> { (s, d) =>
      // Pack surviving docs into 512-token training sequences per
      // language; report each sequence's doc count and token load
      // (loads may exceed 512 where a doc spans the boundary — real
      // packing splits it; the report shows the overflow).
      packSequences(
        cleanCorpus(Tables.documents(s, d), 10, 0.3).filter(col("keep")),
        "lang", 512L)
        .groupBy("lang", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang", "seq_id")
    },

    "pipe_interleave" -> { (s, d) =>
      // First 100 positions of the training order with en weighted 3:1
      // over every other language — prefix ratios follow the weights,
      // and the integer phase key makes the order engine-reproducible.
      interleaveByWeight(
        cleanCorpus(Tables.documents(s, d), 10, 0.3).filter(col("keep")),
        "lang", Map("en" -> 3))
        .select(col("phase"), col("lang"), col("rk"), col("doc_id"))
        .orderBy("phase", "lang", "doc_id")
        .limit(100)
    },

    "pipe_e2e" -> { (s, d) =>
      // The WHOLE daily training-data refresh as ONE composed plan —
      // quality gate → exact dedup → benchmark decontamination →
      // stratified rebalance → token budget → sequence packing —
      // every stage the library operator, so Catalyst fuses the
      // narrow stages and the wide ops stay the dedup window, the
      // bench shingle join, and the per-stratum windows. The oracle
      // rebuilds the same composition in SQL: the end-to-end report
      // matching proves the STAGES COMPOSE, not just pass alone.
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 17 === 2)
      val cleaned = cleanCorpus(docs.filter(col("doc_id") % 17 =!= 2), 10, 0.3)
        .filter(col("keep"))
      val contaminated = decontaminate(cleaned, bench, 3, 5).select("doc_id")
      val safe = cleaned.join(contaminated, Seq("doc_id"), "left_anti")
      val sampled = sampleStratified(safe, "lang", Map("en" -> 3500))
      val budgeted = tokenBudget(sampled, "lang", 3000L)
      packSequences(budgeted, "lang", 512L)
        .groupBy("lang")
        .agg(count_distinct(col("seq_id")).as("n_seqs"),
          count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang")
    },

    "pipe_decontaminate" -> { (s, d) =>
      // Benchmark modeled as the doc_id ≡ 2 (mod 17) slice of the
      // corpus, training set as the rest: duplicated/near-duplicated
      // content across the split (the corpus has exact-dup groups) is
      // exactly the leak decontamination exists to catch. k=3 /
      // minOverlap=5 for the tiny synthetic docs; production uses
      // k=8–13.
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 17 === 2)
      val train = docs.filter(col("doc_id") % 17 =!= 2)
      decontaminate(train, bench, 3, 5)
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .select("doc_id", "lang", "n_overlap")
        .orderBy("doc_id")
    },

    "pipe_dsir" -> { (s, d) =>
      // Data selection by importance to a TARGET distribution (the
      // DSIR idea — Xie et al. 2023, "Data Selection for Language
      // Models via Importance Resampling"): score every doc by how
      // much its unigram mix resembles the target slice (here lang =
      // 'en') vs the whole corpus, keep the top-K. DSIR's log-ratio
      // Σ log p̂_t(w)/p̂_c(w) is replaced by the monotone-comparable
      // EXACT rate difference Σ (ppm_t(w) − ppm_c(w)) with per-million
      // integer rates (`(10⁶·cnt) div total`) — floating-point logs
      // would be engine-ordering-dependent and hash-unsafe, the same
      // trade every scoring op in this repo makes.
      // Shape: per-doc token counts (one tokenize pass per consumer —
      // the dictionary needs a global aggregate of the same frame, so
      // the corpus is scanned twice rather than checkpointing a
      // corpus-sized token frame); the dictionary joins back by token
      // (vocabulary-sized, SHUFFLED not broadcast — Zipf vocabularies
      // outgrow driver memory at 100 TB); top-K lands via
      // TakeOrderedAndProject (per-partition heads, no global sort).
      val docs = Tables.documents(s, d)
      // projection barrier before the generator (docShingles pattern)
      val docTok = docs
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("lang"), explode(col("tk")).as("w"))
        .groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("n"))
      val cnt = docTok.groupBy("w").agg(
        sum(col("n")).as("c_cnt"),
        sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("t_cnt"))
      val tot = cnt.agg(sum(col("c_cnt")).as("c_tot"), sum(col("t_cnt")).as("t_tot"))
      val dict = cnt.crossJoin(broadcast(tot))
        .select(col("w"),
          (expr("(1000000 * t_cnt) div t_tot")
            - expr("(1000000 * c_cnt) div c_tot")).as("ppm"))
      docTok.select("doc_id", "w", "n").join(dict, Seq("w"))
        .groupBy("doc_id").agg(sum(col("n") * col("ppm")).as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id")).limit(50)
    }
  )

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val toksSql = s"string_split($normSql, ' ')"

  val oracles: Map[String, String] = Map(
    "pipe_dataset_card" ->
      s"""WITH e AS (
         |  SELECT lang, source,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS nt,
         |    md5($normSql) AS h,
         |    ROUND(LEAST(CAST(len(string_split($normSql, ' ')) AS DOUBLE) / 100.0, 1.0)
         |      * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text)), 4) AS q
         |  FROM documents),
         |a AS (
         |  SELECT COUNT(*) AS nd, SUM(nt) AS st, COUNT(DISTINCT lang) AS nl,
         |    COUNT(DISTINCT source) AS ns, COUNT(DISTINCT h) AS nh,
         |    SUM(CAST(q AS DECIMAL(12,4))) AS sq
         |  FROM e)
         |SELECT metric, value FROM (
         |  SELECT 'n_docs' AS metric, CAST(nd AS DOUBLE) AS value FROM a
         |  UNION ALL SELECT 'n_tokens', CAST(st AS DOUBLE) FROM a
         |  UNION ALL SELECT 'n_langs', CAST(nl AS DOUBLE) FROM a
         |  UNION ALL SELECT 'n_sources', CAST(ns AS DOUBLE) FROM a
         |  UNION ALL SELECT 'dup_rate', ROUND(CAST(nd - nh AS DOUBLE) / nd, 6) FROM a
         |  UNION ALL SELECT 'mean_quality', ROUND(CAST(sq AS DOUBLE) / nd, 6) FROM a
         |  UNION ALL SELECT 'mean_doc_tokens', ROUND(CAST(st AS DOUBLE) / nd, 6) FROM a
         |) t ORDER BY metric""".stripMargin,

    "pipe_mixture_plan" ->
      s"""WITH avail AS (
         |  SELECT source,
         |    CAST(SUM(len(string_split($normSql, ' '))) AS BIGINT) AS avail
         |  FROM documents GROUP BY source),
         |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM avail),
         |f AS (
         |  SELECT source, avail, 1.0 / n AS w,
         |    CAST(avail AS DOUBLE) / (1.0 / n) AS ratio
         |  FROM avail, ns),
         |c AS (
         |  SELECT *,
         |    COALESCE(SUM(avail) OVER (ORDER BY ratio, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumA,
         |    COALESCE(SUM(w) OVER (ORDER BY ratio, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumW
         |  FROM f),
         |rc AS (
         |  SELECT ratio,
         |    COALESCE(LAG(ratio) OVER (ORDER BY ratio, source), 0.0) AS prev_ratio,
         |    (40000.0 - CAST(cumA AS DOUBLE)) / (1.0 - cumW) AS rCand
         |  FROM c),
         |r AS (
         |  SELECT MIN(CASE WHEN rCand < ratio AND rCand >= prev_ratio
         |    THEN rCand END) AS r FROM rc),
         |a AS (
         |  SELECT source, avail, w,
         |    CASE WHEN r IS NULL THEN avail
         |         ELSE LEAST(avail, CAST(FLOOR(r * w) AS BIGINT)) END AS alloc
         |  FROM c, r)
         |SELECT source, avail, ROUND(w, 6) AS target_share, alloc,
         |  ROUND(CAST(alloc AS DOUBLE) / avail, 6) AS rate,
         |  alloc = avail AS saturated
         |FROM a ORDER BY source""".stripMargin,

    "pipe_quota" ->
      s"""WITH ranked AS (
         |  SELECT source,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rk <= 20 THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_kept
         |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "pipe_curriculum" ->
      s"""WITH scored AS (
         |  SELECT CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    ROUND(LEAST(CAST(len(string_split($normSql, ' ')) AS DOUBLE) / 100.0, 1.0)
         |      * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text)), 4) AS q
         |  FROM documents)
         |SELECT LEAST(CAST(FLOOR(q * 5) AS BIGINT), 4) AS stage,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  ROUND(CAST(SUM(CAST(q AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*), 4) AS avg_quality
         |FROM scored GROUP BY 1 ORDER BY stage""".stripMargin,

    "pipe_source_mix" ->
      """WITH agg AS (
        |  SELECT source, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT SUM(n_docs) AS td, SUM(n_tokens) AS tt FROM agg)
        |SELECT source, lang, n_docs, n_tokens,
        |  ROUND(CAST(n_docs AS DOUBLE) / td, 6) AS doc_share,
        |  ROUND(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share
        |FROM agg CROSS JOIN tot ORDER BY source, lang""".stripMargin,

    "pipe_clean" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |marked AS (
         |  SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep
         |  FROM gated)
         |SELECT lang,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,
         |  CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens
         |FROM marked GROUP BY lang ORDER BY lang""".stripMargin,

    // The incremental path must reproduce the full reclean bit-for-bit,
    // so its oracle IS the full reclean of the current corpus.
    "pipe_clean_incr" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |marked AS (
         |  SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep
         |  FROM gated)
         |SELECT lang,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dups,
         |  CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens
         |FROM marked GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_oversample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS cc FROM documents GROUP BY 1),
        |t AS (SELECT MAX(cc) AS tt FROM c),
        |f AS (
        |  SELECT doc_id, d.lang AS lang,
        |    (tt // cc) + CASE WHEN
        |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) * cc
        |        < (tt % cc) * 65536 THEN 1 ELSE 0 END AS n_copies
        |  FROM documents d JOIN c USING (lang) CROSS JOIN t)
        |SELECT doc_id, lang, CAST(copy AS BIGINT) AS copy
        |FROM f, UNNEST(range(1, n_copies + 1)) AS u(copy)
        |ORDER BY doc_id, copy""".stripMargin,

    "pipe_kfold" ->
      """SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 5 AS fold,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin,

    "pipe_epoch_shuffle" ->
      """WITH e AS (SELECT unnest(range(3)) AS epoch),
        |h AS (
        |  SELECT doc_id, epoch,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS hx
        |  FROM documents CROSS JOIN e)
        |SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
        |  CAST('0x' || substr(hx, 1, 4) AS BIGINT) % 8 AS shard,
        |  CAST('0x' || substr(hx, 1, 12) AS BIGINT) AS ord
        |FROM h ORDER BY epoch, doc_id""".stripMargin,

    "pipe_split" ->
      """SELECT CASE
        |  WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) < 3277 THEN 'val'
        |  WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) < 6554 THEN 'test'
        |  ELSE 'train' END AS split,
        |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "pipe_cluster_gate" ->
      """SELECT CAST(8 AS BIGINT) AS k, CAST(40 AS BIGINT) AS quota,
        |  TRUE AS quota_ok, TRUE AS full_ok, TRUE AS coverage_ok,
        |  TRUE AS total_ok, TRUE AS ids_ok""".stripMargin,

    "pipe_semdedup_gate" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, TRUE AS collapsed_ok,
        |  TRUE AS one_survivor_ok, TRUE AS others_ok, TRUE AS cells_ok,
        |  TRUE AS ids_ok, TRUE AS no_close_pair_ok
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    "pipe_sample" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep FROM gated) t
         |  WHERE keep),
         |sampled AS (
         |  SELECT * FROM kept
         |  WHERE (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 10000)
         |        < CASE WHEN lang = 'en' THEN 3500 ELSE 10000 END)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_sample_weighted" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
        |      < LEAST(CAST(n_chars AS DOUBLE) / 300.0, 1.0) * 65536.0
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_sample_k" ->
      """SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (
        |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    "pipe_budget" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep FROM gated) t
         |  WHERE keep),
         |budgeted AS (
         |  SELECT * FROM (
         |    SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |    FROM kept) t
         |  WHERE cum_tokens <= 2000)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM budgeted GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_budget_bpe" ->
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
         |top1 AS (SELECT lhs || rhs AS pair FROM pairs ORDER BY c DESC, lhs, rhs LIMIT 1),
         |enc AS (
         |  SELECT doc_id,
         |    CAST(SUM(length(replace(token, (SELECT pair FROM top1), chr(1))))
         |      AS BIGINT) AS n
         |  FROM tok GROUP BY 1),
         |j AS (
         |  SELECT d.doc_id, d.lang, coalesce(e.n, 0) AS n_tokens
         |  FROM documents d LEFT JOIN enc e USING (doc_id)),
         |c AS (
         |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM j)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM c WHERE cum <= 4000 GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_pack" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep FROM gated) t
         |  WHERE keep),
         |packed AS (
         |  SELECT lang, doc_id, n_tokens,
         |    CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512 AS BIGINT) AS seq_id
         |  FROM kept)
         |SELECT lang, seq_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM packed GROUP BY 1, 2 ORDER BY lang, seq_id""".stripMargin,

    "pipe_interleave" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM documents
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep FROM gated) t
         |  WHERE keep),
         |ranked AS (
         |  SELECT lang, doc_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rk,
         |    CASE WHEN lang = 'en' THEN 3 ELSE 1 END AS w
         |  FROM kept)
         |SELECT (rk - 1) * (3 // w) AS phase, lang, rk, doc_id
         |FROM ranked
         |ORDER BY phase, lang, doc_id LIMIT 100""".stripMargin,

    "pipe_e2e" ->
      s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 17 <> 2),
         |gated AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tokens,
         |    md5($normSql) AS text_hash
         |  FROM train
         |  WHERE CAST(len(string_split($normSql, ' ')) AS BIGINT) >= 10
         |    AND ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |          / length(text), 4) <= 0.3),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS keep FROM gated) t
         |  WHERE keep),
         |ktoks AS (
         |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
         |  FROM kept),
         |ksh AS (
         |  SELECT DISTINCT doc_id, s FROM ktoks,
         |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |      ELSE [] END)) AS u(s)),
         |btoks AS (
         |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
         |  FROM documents WHERE doc_id % 17 = 2),
         |bsh AS (
         |  SELECT DISTINCT s FROM btoks,
         |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |      ELSE [] END)) AS u(s)),
         |contaminated AS (
         |  SELECT doc_id FROM ksh JOIN bsh USING (s)
         |  GROUP BY 1 HAVING COUNT(*) >= 5),
         |safe AS (
         |  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |sampled AS (
         |  SELECT * FROM safe
         |  WHERE (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 10000)
         |        < CASE WHEN lang = 'en' THEN 3500 ELSE 10000 END),
         |budgeted AS (
         |  SELECT * FROM (
         |    SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |    FROM sampled) t
         |  WHERE cum_tokens <= 3000),
         |packed AS (
         |  SELECT lang, doc_id, n_tokens,
         |    (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512 AS seq_id
         |  FROM budgeted)
         |SELECT lang, CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM packed GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, s FROM toks,
        |    UNNEST(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS u(s)),
        |bench AS (SELECT DISTINCT s FROM sh0 WHERE doc_id % 17 = 2),
        |train AS (SELECT doc_id, s FROM sh0 WHERE doc_id % 17 <> 2),
        |ov AS (
        |  SELECT doc_id, COUNT(*) AS n_overlap
        |  FROM train JOIN bench USING (s)
        |  GROUP BY 1 HAVING COUNT(*) >= 5)
        |SELECT d.doc_id, d.lang, n_overlap
        |FROM ov JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "pipe_dsir" ->
      s"""WITH doctok AS (
         |  SELECT doc_id, lang, w, COUNT(*) AS n FROM (
         |    SELECT doc_id, lang, unnest($toksSql) AS w FROM documents)
         |  GROUP BY 1, 2, 3),
         |cnt AS (
         |  SELECT w, CAST(SUM(n) AS BIGINT) AS c_cnt,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS t_cnt
         |  FROM doctok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c_cnt) AS BIGINT) AS c_tot,
         |    CAST(SUM(t_cnt) AS BIGINT) AS t_tot FROM cnt),
         |dict AS (
         |  SELECT w, (1000000 * t_cnt) // t_tot - (1000000 * c_cnt) // c_tot AS ppm
         |  FROM cnt CROSS JOIN tot)
         |SELECT doc_id, CAST(SUM(n * ppm) AS BIGINT) AS score_ppm
         |FROM doctok JOIN dict USING (w)
         |GROUP BY 1 ORDER BY score_ppm DESC, doc_id LIMIT 50""".stripMargin
  )
}
