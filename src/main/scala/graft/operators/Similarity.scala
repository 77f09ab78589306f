package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.Fx._
import graft.sources.Tables

/** Similarity search over embedding columns (SURVEY §2 group 4).
  *
  * `bruteForceTopK` is the exact baseline: query-set × corpus with
  * codegen'd higher-order-function dot products. At 100 TB the corpus
  * side stays partitioned and the (small) query set is broadcast — the
  * product is embarrassingly parallel and never shuffles the corpus.
  *
  * `lshTopK` is the scale path: random-hyperplane signatures bucket
  * the corpus (one narrow projection), candidates meet through an
  * equi-join on bucket key, and only candidates pay the exact-distance
  * cost. Hyperplanes are derived from a seeded hash of (plane, dim) —
  * deterministic, no driver-side random state to ship.
  */
object Similarity {

  /** Corpus with precomputed L2 norm (computed once, reused per pair). */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("norm", l2norm(col("embedding")))

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val c = withNorm(corpus).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val pairs = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Exact top-k EUCLIDEAN neighbors — the ground truth an L2-ranked
    * quantization index (PQ/OPQ/IVFPQ) is measured against, where
    * [[bruteForceTopK]]'s cosine order would mis-score it on
    * unnormalized corpora. dist² = |q|² + |c|² − 2·q·c over the
    * broadcast query side — same one-pass shape. */
  def bruteForceTopKL2(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val c = withNorm(corpus).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val pairs = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dist2", round(
        col("q_norm") * col("q_norm") + col("c_norm") * col("c_norm")
          - lit(2.0) * dot(col("q_emb"), col("c_emb")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("dist2"), col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dist2"), col("rk"))
  }

  /** Exact top-k MAXIMUM-INNER-PRODUCT neighbors — the
    * recommendation-scoring order (user·item, retrieval logits) where
    * vector MAGNITUDE matters, so both cosine and L2 rank wrong. Same
    * one-pass broadcast shape as [[bruteForceTopK]]. */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val pairs = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", round(dot(col("q_emb"), col("c_emb")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("ip").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("ip"), col("rk"))
  }

  /** Exact cosine RADIUS search: every corpus neighbor within
    * `minCos` of each query — the "find all matches above threshold"
    * retrieval mode top-k can't express (k is unknown; a near-dup
    * sweep wants ALL hits). Same one-pass broadcast shape as
    * [[bruteForceTopK]]; the threshold compares the ROUNDED cosine so
    * the boundary set hashes identically cross-engine. The query side
    * must be broadcast-bounded; corpus×corpus radius search at scale
    * goes through the banded hyperplane-LSH path
    * (Dedup.embCosLshPairs), never this. */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, minCos: Double): DataFrame = {
    val q = withNorm(queries).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val c = withNorm(corpus).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("norm").as("c_norm"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 4))
      .filter(col("cos") >= minCos)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Symmetric per-dimension INT8 scalar quantization audit — the
    * "can we serve this corpus at 4× less memory" gate an index build
    * runs before switching the store to int8: per dimension the scale
    * is max|x| over the corpus (an order-independent MAX — one narrow
    * posexplode + a |dims|-row aggregate, broadcast back as one array
    * literal); each vector then reports its reconstruction cosine and
    * MSE against code·scale/127 dequantization. All per-vector sums
    * fold the arrays in element order (functions.aggregate), so the
    * doubles match the oracle's list_sum exactly — no shuffle of
    * vector payloads at all. */
  def int8QuantAudit(emb: DataFrame): DataFrame = {
    val scales = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(max(abs(col("x").cast(DoubleType))).as("s"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("s")))),
        p => p.getField("s")).as("sl"))
    def dsum(a: Column): Column = aggregate(a, lit(0.0), (acc, v) => acc + v)
    emb.crossJoin(broadcast(scales))
      .withColumn("rec", zip_with(col("embedding"), col("sl"),
        (x, s) => when(s === 0.0, lit(0.0)).otherwise(
          greatest(lit(-127.0), least(lit(127.0),
            round(x.cast(DoubleType) / s * 127))) * s / 127)))
      .select(col("vec_id"),
        round(dsum(zip_with(col("embedding"), col("rec"),
            (x, r) => x.cast(DoubleType) * r))
          / (sqrt(dsum(transform(col("embedding"),
              x => x.cast(DoubleType) * x.cast(DoubleType))))
            * sqrt(dsum(transform(col("rec"), r => r * r)))), 4).as("recon_cos"),
        round(dsum(zip_with(col("embedding"), col("rec"),
            (x, r) => (x.cast(DoubleType) - r) * (x.cast(DoubleType) - r)))
          / size(col("embedding")), 6).as("mse"))
  }

  /** Bucketed MIPS via the public norm-augmentation reduction
    * (Bachrach et al. '14 / Shrivastava-Li asymmetric LSH): corpus
    * x → [x, √(M²−‖x‖²)] (M = the corpus's max norm, one tiny
    * aggregate) brings every corpus vector to norm M, and query
    * q → [q, 0] leaves inner products untouched — so
    * cos(q', x') = q·x / (‖q‖·M) is RANK-EQUIVALENT to the inner
    * product and the existing hyperplane-LSH cosine machinery buckets
    * MIPS with no new index structure. Scale shape identical to
    * [[lshTopKFor]]: banded equi-join on bucket keys, never all-pairs. */
  def mipsLshTopKFor(queries: DataFrame, corpus: DataFrame, planes: Int, k: Int,
      probes: Int = 0): DataFrame = {
    val m = withNorm(corpus).agg(max(col("norm"))).head().getDouble(0)
    val caug = withNorm(corpus).withColumn("embedding",
      concat(col("embedding"),
        // greatest(0, ·): the max-norm vector's residual is 0 up to
        // float error, and sqrt(-1e-12) would poison it to NaN
        array(sqrt(greatest(lit(0.0), lit(m * m) - col("norm") * col("norm"))).cast("float"))))
      .drop("norm")
    val qaug = queries.withColumn("embedding",
      concat(col("embedding"), array(lit(0.0f))))
    mipsRerank(lshTopKFor(qaug, caug, planes, k, probes), queries, corpus)
  }

  /** Re-rank a candidate (query_id, neighbor_id) frame by TRUE inner
    * product — the augmented cosine agrees on ORDER but its value is
    * scaled by 1/(‖q‖·M), so surfaced scores re-compute against the
    * original vectors (|candidates| ≤ |queries|·k rows, one narrow
    * join each side). */
  private def mipsRerank(cands: DataFrame, queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("ip").desc, col("neighbor_id"))
    cands.select("query_id", "neighbor_id")
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("ip", round(dot(col("q_emb"), col("c_emb")), 4))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .select(col("query_id"), col("neighbor_id"), col("ip"), col("rk"))
  }

  /** Average recall@k of an approximate ANN result against its exact
    * baseline, reduced to ONE driver-checkable row: (n_queries, k,
    * recall_ok) where recall_ok ⇔ mean per-query recall ≥ `threshold`.
    * Everything runs distributed (one semi-join on (query, neighbor) +
    * two tiny aggregates); queries the approximate side missed
    * entirely count as recall 0, so a silently-empty result fails the
    * gate rather than inflating it. The boolean makes sketch-dependent
    * output HASH-comparable: DuckDB can't rebuild LSH buckets or PQ
    * codes, but it can assert `TRUE` — so CORRECTNESS now pins
    * quality, not just row counts, for the ANN family. */
  def recallSummary(approx: DataFrame, exact: DataFrame, k: Int,
      threshold: Double): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("__hits"))
    exact.groupBy("query_id").agg(count(lit(1)).as("__k"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("__hits"))
      .agg(
        count(lit(1)).as("n_queries"),
        max(lit(k.toLong)).as("k"),
        (avg(col("__hits").cast(DoubleType) / col("__k")) >= threshold).as("recall_ok"))
  }

  /** Planted-neighbor query batch for recall gating — the
    * ANN-benchmark device that makes recall MEANINGFUL on a corpus
    * with no cluster structure (on uniform random vectors, true
    * nearest neighbors are barely nearer than anything else, and every
    * ANN method's recall legitimately collapses): take the first `n`
    * corpus vectors, perturb each slightly (0.99·v + 0.02·reverse(v),
    * deterministic, ~0.999 cosine to its source), and re-id them far
    * above the corpus range. Each planted query has one overwhelming
    * true neighbor — its source vector — so the exact baseline is
    * dominated by signal and a healthy index scores near 1.0 while a
    * broken one (bad routing, collapsed codes, wrong buckets) scores
    * near 0. */
  def plantedQueries(emb: DataFrame, n: Long, offset: Long = 1L << 40): DataFrame =
    emb.filter(col("vec_id") < n).select(
      (col("vec_id") + lit(offset)).as("vec_id"),
      zip_with(col("embedding"), reverse(col("embedding")),
        (a, b) => (a * lit(0.99f) + lit(0.02f) * b).cast("float")).as("embedding"))

  /** Deterministic ±1 hyperplane weights for (plane, dim), memoized
    * per (planes, dim) shape: the murmur mix runs once per shape per
    * JVM instead of once per (row × plane × dim) — the hashing was
    * costlier than the projection arithmetic it steered. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()
  def planeSigns(planes: Int, dim: Int): Array[Array[Byte]] =
    signCache.computeIfAbsent((planes, dim), { case (p0, d0) =>
      Array.tabulate(p0)(p => Array.tabulate(d0) { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, i))
        if ((h & 1) == 1) 1.toByte else (-1).toByte
      })
    })

  /** JVM kernel of [[lshSignature]]: the packed sign-bit signature of
    * one vector. Shared verbatim by the batch path (via the codegen'd
    * [[org.apache.spark.sql.graft.HyperplaneSigExpr]]) and the
    * streaming twin (streaming.StreamOps.embDedup), so streamed
    * vectors land in the SAME buckets as a batch backfill over the
    * same corpus. */
  def hyperplaneBits(e: Array[Float], planes: Int): Long = {
    val signs = planeSigns(planes, e.length)
    var bits = 0L
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var s = 0.0
      var i = 0
      while (i < e.length) {
        s += (if (sp(i) == 1) e(i).toDouble else -e(i).toDouble)
        i += 1
      }
      if (s > 0) bits |= 1L << p
      p += 1
    }
    bits
  }

  /** JVM twin of the band slicing in `Dedup.embCosPairsBucketed` for
    * ONE vector: its (band, band_hash) keys — bit-exact with the
    * Spark `shiftright`/`bitwiseAND` expressions (signatures occupy
    * bits 0..planes-1 ≤ 62, so arithmetic vs logical shift agree;
    * spec-proven). */
  def hyperplaneBandKeys(e: Array[Float], planes: Int, bands: Int): Array[(Int, Long)] = {
    require(planes % bands == 0, s"planes=$planes not divisible by bands=$bands")
    val r = planes / bands
    val bits = hyperplaneBits(e, planes)
    Array.tabulate(bands)(j => (j, (bits >> (j * r)) & ((1L << r) - 1)))
  }

  /** Random-hyperplane LSH signature: bit p = sign of a pseudo-random
    * projection where plane p's weight on dimension i is a
    * deterministic ±1 from a murmur mix of (p, i).
    *
    * Computed by the codegen'd
    * [[org.apache.spark.sql.graft.HyperplaneSigExpr]] — a map-only
    * projection fused into whole-stage codegen, reading the float
    * array straight from the unsafe row (no Encoder round trip, no
    * `planes`× interpreted higher-order-function passes). Bit-exact
    * with [[lshSignatureTyped]] (spec-proven). */
  def lshSignature(emb: DataFrame, planes: Int): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
      org.apache.spark.sql.graft.HyperplaneSigFunctions
        .hyperplaneSig(col("embedding"), planes).as("bucket"))

  /** Typed-Dataset reference formulation of [[lshSignature]], running
    * the identical JVM kernel through an Encoder round trip. Kept as
    * the parity oracle for the codegen expression. */
  def lshSignatureTyped(emb: DataFrame, planes: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) => (id, e, hyperplaneBits(e, planes)) }
      .toDF("vec_id", "embedding", "bucket")
  }

  /** ANN via LSH buckets: exact cosine only within matching buckets.
    *
    * `probes` > 0 enables multi-probe: the query side ALSO visits the
    * `probes` buckets at Hamming distance 1 from its own (flip bit
    * 0..probes-1) — the standard recall fix that costs query-side
    * fan-out (×(probes+1) on the small side of the join) instead of
    * more hash tables over the corpus. A near-neighbor that landed one
    * sign-bit away (the most likely miss: each extra Hamming step is
    * another independent hyperplane disagreeing) is recovered. Corpus
    * side stays single-bucket — its size, not the query set's, is the
    * 100 TB term. */
  def lshTopK(emb: DataFrame, planes: Int, k: Int, probes: Int = 0): DataFrame =
    lshTopKFor(emb, emb, planes, k, probes)

  /** [[lshTopK]] with a SEPARATE query frame — the production shape
    * (a query batch against the indexed corpus, not corpus-vs-itself):
    * both sides hash through the same deterministic hyperplanes, so a
    * query's bucket meets exactly the corpus vectors it would have
    * met as a corpus member. */
  def lshTopKFor(queries: DataFrame, corpus: DataFrame, planes: Int, k: Int,
      probes: Int = 0): DataFrame = {
    require(probes >= 0 && probes <= planes, s"probes=$probes out of [0, $planes]")
    // Two independently-built sides (disjoint names): a same-lineage
    // self-join degrades to a nested-loop — see Dedup.ngramJaccardPairs.
    def side(df: DataFrame, q: String, n: String, b: String): DataFrame =
      withNorm(lshSignature(df, planes))
        .select(col("vec_id").as(q), col("embedding").as(n), col("norm").as(s"${n}_norm"), col("bucket").as(b))
    val a0 = side(queries, "query_id", "q_emb", "bucket_a")
    val a =
      if (probes == 0) a0
      else a0.select(col("query_id"), col("q_emb"), col("q_emb_norm"),
        explode(array(col("bucket_a") +: (0 until probes).map(p =>
          col("bucket_a").bitwiseXOR(lit(1L << p))): _*)).as("bucket_a"))
    val b = side(corpus, "neighbor_id", "c_emb", "bucket_b")
    val pairs = a.join(b,
        col("bucket_a") === col("bucket_b") && col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")), 4).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType)).filter(col("rk") <= k)
  }

  /** JVM kernel: cosine-nearest centroid index (ties → lowest index).
    * Zero-norm GUARD: a zero-norm centroid or vector would make the
    * division NaN — NaN comparisons happen to be always-false here
    * (degenerate cells just never win), but that's incidental, not a
    * contract. Explicitly rank zero-norm as −∞ similarity: degenerate
    * cells are deterministically never selected, and an all-zero
    * vector deterministically lands in cell 0. */
  private def nearestCell(cents: Array[Array[Float]], cNorms: Array[Double], e: Array[Float]): Int = {
    var en = 0.0
    var i = 0
    while (i < e.length) { en += e(i).toDouble * e(i).toDouble; i += 1 }
    val norm = math.sqrt(en)
    var best = Double.NegativeInfinity
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val v = cents(c)
      var d = 0.0; var j = 0
      while (j < e.length) { d += e(j).toDouble * v(j).toDouble; j += 1 }
      val cos =
        if (norm == 0.0 || cNorms(c) == 0.0) Double.NegativeInfinity
        else d / (norm * cNorms(c))
      if (cos > best) { best = cos; bestC = c }
      c += 1
    }
    bestC
  }

  /** Driver-side query-batch materialization with a size gate — the
    * same fail-fast [[Dedup.embCosPairs]] has: query sets are small by
    * definition (the LUT/broadcast designs depend on it), so an
    * oversized batch must fail with guidance instead of OOMing the
    * driver mid-collect. One count job before the collect. */
  private def collectQueries(queries: DataFrame, maxQueryRows: Long,
      op: String): Array[(Long, Array[Float])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val rows = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    val n = rows.count()
    require(n <= maxQueryRows,
      s"$op collects the query batch driver-side to build per-query LUTs: " +
        s"$n query vectors > cap $maxQueryRows. Split the batch, or raise " +
        "maxQueryRows only if driver memory provably holds |q|·dim floats + LUTs.")
    rows.collect()
  }

  private def norms(cents: Array[Array[Float]]): Array[Double] =
    cents.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }

  /** Deterministic farthest-point k-means seeding (k-means++ without
    * the RNG): start from the first candidate, repeatedly add the one
    * farthest from the chosen set (ties → first). Guarantees distinct
    * seeds while distinct candidates remain; if the pool has fewer
    * distinct values than k, the surplus degenerates to repeats (the
    * data genuinely has < k clusters there). */
  private def farthestPointSeeds(cands: Array[Array[Float]], k: Int): Array[Array[Float]] = {
    val chosen = scala.collection.mutable.ArrayBuffer(cands(0))
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    while (chosen.length < k) {
      var best = -1.0
      var bestB: Array[Float] = null
      cands.foreach { b =>
        val dmin = chosen.iterator.map(c => l2sq(b, c)).min
        if (dmin > best) { best = dmin; bestB = b }
      }
      chosen += bestB
    }
    chosen.toArray
  }

  /** L2 twin of [[nearestCell]]: argmin squared distance of `cents`
    * against the block of `e` starting at `off` (ties → lowest index).
    * The offset form lets PQ encode against a subspace codebook
    * without slicing a new array per row. */
  private def nearestCellL2(cents: Array[Array[Float]], e: Array[Float], off: Int): Int = {
    var best = Double.MaxValue
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val v = cents(c)
      var s = 0.0; var j = 0
      while (j < v.length) {
        val d = e(off + j).toDouble - v(j).toDouble; s += d * d; j += 1
      }
      if (s < best) { best = s; bestC = c }
      c += 1
    }
    bestC
  }

  /** Lloyd's k-means refinement of IVF centroids, Spark-shaped: each
    * iteration is one narrow mapPartitions emitting per-partition
    * partial (cell, count, sum) triples — k small rows per task, the
    * map-side combine — reduced by cell (a k-row shuffle, never the
    * corpus) and collected as the next centroid set. The full vectors
    * are never shuffled and the driver only ever holds k×dim floats.
    * Seeds are the first k corpus vectors (deterministic); an empty
    * cell keeps its previous centroid. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Array[Array[Float]] =
    lloyd(emb, k, iters, (cs, ns, e) => nearestCell(cs, ns, e))

  private def lloyd(emb: DataFrame, k: Int, iters: Int,
      assign: (Array[Array[Float]], Array[Double], Array[Float]) => Int): Array[Array[Float]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
    // seeds: the k lowest-id vectors (distributed TakeOrdered, k rows
    // to the driver) — equals "ids < k" on dense-id corpora but also
    // works on samples/sparse ids
    var cents = rows.orderBy("vec_id").limit(k).collect().sortBy(_._1).map(_._2)
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast((cents, norms(cents)))
      val updated = rows.mapPartitions { it =>
        val (cs, ns) = bc.value
        val dim = if (cs.isEmpty) 0 else cs(0).length
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val counts = new Array[Long](cs.length)
        it.foreach { case (_, e) =>
          val c = assign(cs, ns, e)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += e(i).toDouble; i += 1 }
        }
        Iterator.range(0, cs.length).filter(counts(_) > 0)
          .map(c => (c, counts(c), sums(c)))
      }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val s = new Array[Double](a._3.length)
          var i = 0
          while (i < s.length) { s(i) = a._3(i) + b._3(i); i += 1 }
          (a._1, a._2 + b._2, s)
        }
        .map { case (c, (_, n, s)) => (c, s.map(x => (x / n).toFloat)) }
        .collect().toMap
      cents = cents.indices.map(c => updated.getOrElse(c, cents(c))).toArray
    }
    cents
  }

  /** [[ivfAssign]] against an explicit centroid set (e.g. from
    * [[kmeansCentroids]]); cell ids are centroid indices. */
  def ivfAssignTo(emb: DataFrame, cents: Array[Array[Float]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((cents, norms(cents)))
    emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, e) =>
        val (cs, ns) = bc.value
        var en = 0.0; var i = 0
        while (i < e.length) { en += e(i).toDouble * e(i).toDouble; i += 1 }
        (id, e, math.sqrt(en), nearestCell(cs, ns, e).toLong)
      }
      .toDF("vec_id", "embedding", "norm", "cell")
  }

  /** IVF cell assignment: nearest-centroid argmax as ONE narrow typed
    * map over a broadcast centroid set (the first `nCells` vectors act
    * as seed centroids — a production build would k-means them). No
    * join, no window, no shuffle: per row, a tight primitive loop over
    * the (tiny) centroid array; ties go to the lowest centroid id, the
    * same order the declarative `row_number() = 1` formulation picked.
    * Returns (vec_id, embedding, norm, cell) — norm is computed here
    * once so downstream search never recomputes it per pair. */
  def ivfAssign(emb: DataFrame, nCells: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
    def l2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val cents = rows.filter(r => r._1 < nCells).collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast((cents.map(_._1), cents.map(_._2), cents.map(c => l2(c._2))))
    rows.map { case (id, e) =>
      val (cIds, cVecs, cNorms) = bc.value
      val en = l2(e)
      var best = Double.NegativeInfinity
      var bestId = -1L
      var c = 0
      while (c < cVecs.length) {
        val v = cVecs(c)
        var d = 0.0; var j = 0
        while (j < e.length) { d += e(j).toDouble * v(j).toDouble; j += 1 }
        val cos = d / (en * cNorms(c))
        if (cos > best) { best = cos; bestId = cIds(c) }
        c += 1
      }
      (id, e, en, bestId)
    }.toDF("vec_id", "embedding", "norm", "cell")
  }

  /** IVF-style ANN: [[ivfAssign]] buckets the corpus, search is exact
    * cosine within the query's cell only — an equi-join on cell id; the
    * corpus is never cross-joined. The assignment is materialized ONCE
    * (localCheckpoint) and feeds both join sides; at 100 TB it would be
    * a table written partitioned by cell, amortized across query
    * batches.
    *
    * `salt` > 1 is the skew guard (SURVEY §7.9): real corpora cluster,
    * so one hot cell can own a large corpus fraction and serialize its
    * reducer. Salting splits the corpus side of a hot cell across
    * `salt` sub-keys by row hash and replicates the query side per
    * sub-key — every query still meets every corpus vector in its
    * cell, and the per-query top-k window after the join re-merges the
    * sub-buckets. Result is identical to salt=1 (spec-proven).
    *
    * `kmeansIters` > 0 refines the seed centroids with that many
    * Lloyd's iterations ([[kmeansCentroids]]) before assignment. On a
    * clustered corpus, first-N seeding can put several centroids
    * inside one natural cluster and none in another — splitting true
    * neighbors across cells and losing recall; k-means moves the
    * centroids to the cluster means (recall gain spec-measured). Each
    * iteration costs one narrow corpus pass + a k-row reduce — the
    * vectors themselves never shuffle. */
  def ivfTopK(emb: DataFrame, nCells: Int, k: Int, salt: Int = 1,
      kmeansIters: Int = 0): DataFrame =
    ivfTopKAssigned((
      if (kmeansIters > 0) ivfAssignTo(emb, kmeansCentroids(emb, nCells, kmeansIters))
      else ivfAssign(emb, nCells)
    ), k, salt)

  /** [[ivfTopK]] against an EXPLICIT centroid set — the amortized
    * path: k-means centroids are corpus statistics, so build them once
    * ([[kmeansCentroids]]), persist them ([[saveCentroids]]), and let
    * every later query batch skip straight to assignment. Identical to
    * `ivfTopK(..., kmeansIters = n)` when `cents` came from the same
    * k-means run (spec-proven through a save/load round trip). */
  def ivfTopKFrom(emb: DataFrame, cents: Array[Array[Float]], k: Int,
      salt: Int = 1): DataFrame =
    ivfTopKAssigned(ivfAssignTo(emb, cents), k, salt)

  /** Top-`nprobe` centroids of one vector by cosine (ties → lowest
    * cell id; zero-norm centroids/queries rank last, as in
    * [[nearestCell]]). Cost: one pass over the centroid array + a sort
    * of the (tiny) cell-id range — query-side only. */
  private def topCells(cents: Array[Array[Float]], cNorms: Array[Double],
      e: Array[Float], nprobe: Int): Array[Long] = {
    var en = 0.0
    var i = 0
    while (i < e.length) { en += e(i).toDouble * e(i).toDouble; i += 1 }
    val qn = math.sqrt(en)
    val cos = Array.tabulate(cents.length) { c =>
      val v = cents(c)
      var d = 0.0; var j = 0
      while (j < e.length) { d += e(j).toDouble * v(j).toDouble; j += 1 }
      if (qn == 0.0 || cNorms(c) == 0.0) Double.NegativeInfinity
      else d / (qn * cNorms(c))
    }
    (0 until cents.length).sortBy(c => (-cos(c), c)).take(nprobe)
      .map(_.toLong).toArray
  }

  /** Multi-probe IVF with a SEPARATE query frame — the recall knob
    * plain IVF lacks (the coarse quantizer's nearest cell often does
    * not contain the true nearest neighbor when the query sits near a
    * cell boundary). Each query visits its `nprobe` nearest cells
    * (query-side fan-out only — the corpus keeps its single-cell
    * assignment, so corpus state and the equi-join stay exactly
    * [[ivfTopK]]'s); a corpus vector lives in one cell, so (query,
    * neighbor) pairs cannot duplicate across probes. At 100 TB:
    * queries × nprobe rows against a corpus-partitioned equi-join —
    * the same shape ivfpq's probed search uses, with raw vectors. */
  def ivfTopKProbed(queries: DataFrame, corpus: DataFrame,
      cents: Array[Array[Float]], k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= cents.length,
      s"nprobe=$nprobe out of [1, ${cents.length}]")
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((cents, norms(cents)))
    val c = ivfAssignTo(corpus, cents)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"), col("cell"))
    val q = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, e) =>
        val (cs, ns) = bc.value
        var en = 0.0; var i = 0
        while (i < e.length) { en += e(i).toDouble * e(i).toDouble; i += 1 }
        val qn = math.sqrt(en)
        topCells(cs, ns, e, nprobe).iterator.map(cell => (id, e, qn, cell))
      }
      .toDF("query_id", "q_emb", "q_norm", "cell")
    val pairs = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 4).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** PQ codebooks → parquet sidecar (subspace, centroid, embedding),
    * the PQ companion of [[saveCentroids]]: train once on a sample,
    * persist, and every encode/search run loads KBs instead of
    * re-running Lloyd over the corpus. */
  def savePqBooks(spark: SparkSession, books: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (v, c) => (j.toLong, c.toLong, v) }
    }.toSeq.toDF("subspace", "centroid", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[savePqBooks]] sidecar, bit-exact. */
  def loadPqBooks(spark: SparkSession, path: String): Array[Array[Array[Float]]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("subspace").cast("long"), col("centroid").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
  }

  /** Centroids → a 2-row-group parquet sidecar: (cell, embedding).
    * Tiny (k × dim floats); lives next to the corpus the way a zone
    * map lives next to a snapshot version. */
  def saveCentroids(spark: SparkSession, cents: Array[Array[Float]], path: String): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("cell", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCentroids]] sidecar, bit-exact. */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("cell").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
  }

  private def ivfTopKAssigned(assignedRaw: DataFrame, k: Int, salt: Int): DataFrame = {
    val assigned = assignedRaw.materialize()
    val a0 = assigned.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      col("norm").as("q_norm"), col("cell"))
    val b0 = assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      col("norm").as("c_norm"), col("cell").as("cell_b"))
    val (a, b, joinCond) =
      if (salt <= 1)
        (a0, b0, col("cell") === col("cell_b") && col("query_id") =!= col("neighbor_id"))
      else {
        val aS = a0.withColumn("salt_a", explode(sequence(lit(0), lit(salt - 1))))
        val bS = b0.withColumn("salt_b", pmod(xxhash64(col("neighbor_id")), lit(salt)).cast("int"))
        (aS, bS, col("cell") === col("cell_b") && col("salt_a") === col("salt_b")
          && col("query_id") =!= col("neighbor_id"))
      }
    val pairs = a.join(b, joinCond)
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 4).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast(LongType)).filter(col("rk") <= k)
  }

  // ---- Product quantization (PQ) ----

  /** Train PQ codebooks — FUSED Lloyd: the dim-D vector splits into
    * `m` contiguous subspaces of D/m dims with `ksub` L2 k-means
    * centroids each, and ALL m subspaces update in the SAME corpus
    * pass (one narrow mapPartitions per iteration emitting m × ksub
    * partial (count, sum) cells, reduced by flat cell id — a tiny
    * shuffle, the vectors never move). Training costs `iters` corpus
    * scans total, not m × iters jobs. Codebooks are corpus statistics
    * like IVF centroids: train on a sample in production and persist
    * them the same way. Seeds: per subspace, a deterministic
    * farthest-point spread over the 8·ksub lowest-id vectors' blocks —
    * naive first-ksub seeding hands Lloyd duplicate seeds whenever the
    * prefix repeats a block value, and a duplicated centroid never
    * separates again (a dead centroid = one merged cluster forever). */
  def pqTrain(emb: DataFrame, m: Int, ksub: Int, iters: Int): Array[Array[Array[Float]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"pqTrain: dim=$dim not divisible by m=$m")
    require(ksub <= 128, "pq codes are stored as bytes")
    val sub = dim / m
    val rows = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
    val seeds = rows.orderBy("vec_id").limit(math.max(8 * ksub, ksub))
      .collect().sortBy(_._1).map(_._2)
    require(seeds.length >= ksub, s"pqTrain: corpus has ${seeds.length} < ksub=$ksub vectors")
    val books = Array.tabulate(m)(j => farthestPointSeeds(
      seeds.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)), ksub))
    pqRefine(emb, books, iters)
  }

  /** `iters` Lloyd refinement passes over existing codebooks — the
    * warm-start body of [[pqTrain]], exposed separately so OPQ's
    * alternation can CONTINUE from the previous iteration's books
    * (re-seeding from scratch each round can land on a worse local
    * optimum and break the alternation's monotone error descent). */
  def pqRefine(emb: DataFrame, books0: Array[Array[Array[Float]]],
      iters: Int): Array[Array[Array[Float]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
    val (m, ksub) = (books0.length, books0(0).length)
    var books = books0
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(books)
      val updated = rows.mapPartitions { it =>
        val bks = bc.value
        val (mm, kk, ss) = (bks.length, bks(0).length, bks(0)(0).length)
        val counts = new Array[Long](mm * kk)
        val sums = Array.fill(mm * kk)(new Array[Double](ss))
        it.foreach { case (_, e) =>
          var j = 0
          while (j < mm) {
            val cell = j * kk + nearestCellL2(bks(j), e, j * ss)
            counts(cell) += 1
            var t = 0
            while (t < ss) { sums(cell)(t) += e(j * ss + t).toDouble; t += 1 }
            j += 1
          }
        }
        Iterator.range(0, counts.length).filter(counts(_) > 0)
          .map(cell => (cell, counts(cell), sums(cell)))
      }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val s = new Array[Double](a._3.length)
          var i = 0
          while (i < s.length) { s(i) = a._3(i) + b._3(i); i += 1 }
          (a._1, a._2 + b._2, s)
        }
        .map { case (cell, (_, n, s)) => (cell, s.map(x => (x / n).toFloat)) }
        .collect().toMap
      books = Array.tabulate(m)(j => Array.tabulate(ksub)(c =>
        updated.getOrElse(j * ksub + c, books(j)(c))))
    }
    books
  }

  /** PQ-encode the corpus: per vector, `m` one-byte codes — the
    * nearest subspace centroid per block. dim-64 floats (256 B) become
    * m=8 bytes, a 32× compression: the footprint move that lets a
    * 100 TB corpus's search index fit where raw vectors can't. One
    * narrow typed map against the broadcast codebooks. */
  def pqEncode(emb: DataFrame, books: Array[Array[Array[Float]]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(books)
    emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, e) =>
        val bks = bc.value
        val sub = e.length / bks.length
        val codes = new Array[Byte](bks.length)
        var j = 0
        while (j < bks.length) {
          codes(j) = nearestCellL2(bks(j), e, j * sub).toByte; j += 1
        }
        (id, codes)
      }.toDF("vec_id", "codes")
  }

  /** PQ asymmetric-distance (ADC) top-k: queries keep full vectors,
    * the corpus is its codes. Per query a lookup table of
    * m × ksub partial squared distances is built once per partition;
    * each code row then costs m array reads + adds. Inside the
    * partition a bounded per-query heap keeps only the k best, so the
    * shuffle to the final per-query merge window carries
    * |partitions| × |queries| × k candidate rows — never the corpus.
    * Approximate by construction (quantization error); recall vs the
    * exact baseline is spec-measured. */
  def pqTopK(queries: DataFrame, codes: DataFrame,
      books: Array[Array[Array[Float]]], k: Int,
      maxQueryRows: Long = 1L << 16): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val qs = collectQueries(queries, maxQueryRows, "pqTopK").sortBy(_._1)
    val bcQ = spark.sparkContext.broadcast(qs)
    val bcB = spark.sparkContext.broadcast(books)
    val cand = codes.select(col("vec_id").cast("long"), col("codes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val (q, bks) = (bcQ.value, bcB.value)
        val m = bks.length
        val luts = q.map { case (_, e) =>
          val sub = e.length / m
          Array.tabulate(m)(j => Array.tabulate(bks(j).length) { c =>
            val v = bks(j)(c)
            var s = 0.0; var t = 0
            while (t < sub) {
              val d = e(j * sub + t).toDouble - v(t).toDouble; s += d * d; t += 1
            }
            s
          })
        }
        val ord = implicitly[Ordering[(Double, Long)]]
        // max-heap per query: the head is the current worst keeper
        val heaps = Array.fill(q.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        it.foreach { case (id, cs) =>
          var qi = 0
          while (qi < q.length) {
            if (q(qi)._1 != id) {
              val lut = luts(qi)
              var s = 0.0; var j = 0
              while (j < m) { s += lut(j)(cs(j) & 0xff); j += 1 }
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, id))
              else if (ord.lt((s, id), h.head)) { h.dequeue(); h.enqueue((s, id)) }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (dist, id) => (q(qi)._1, id, dist) }
        }
      }
      .toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    cand.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("adist"), 6).as("adist"), col("rk"))
  }

  /** IVF × PQ — the composed index (FAISS's IVFPQ shape): the coarse
    * quantizer routes search to `nprobe` cells, PQ codes built on
    * RESIDUALS (e − centroid[cell]) answer distances inside them.
    * Residual encoding is the precision win over raw-vector codebooks:
    * after coarse quantization the residual spread is much tighter, so
    * the same ksub centroids quantize it finer.
    *
    * Distributed shape at 100 TB: centroids and codebooks are tiny
    * corpus statistics (broadcast); the corpus holds only (cell,
    * m-byte code) rows — the index is ~m bytes/vector. A query batch
    * collects to the driver (query sets are small by definition),
    * computes per-(query, probed-cell) LUTs there (|q| × nprobe ×
    * m × ksub doubles — KBs), and broadcasts them keyed by cell; one
    * narrow pass over the code rows then updates per-query bounded
    * heaps, and the merge shuffle carries partition top-k only. The
    * corpus is never re-read as floats at query time. */
  def ivfpqTopK(emb: DataFrame, queries: DataFrame, nCells: Int, m: Int,
      ksub: Int, iters: Int, k: Int, nprobe: Int,
      maxQueryRows: Long = 1L << 16): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCells, s"nprobe=$nprobe out of [1, $nCells]")
    val (cents, books, codes) = ivfpqBuild(emb, nCells, m, ksub, iters)
    ivfpqSearch(codes, queries, cents, books, k, nprobe, maxQueryRows)
  }

  /** Build the IVFPQ artifact pieces: k-means cells, residual-trained
    * codebooks, and the (vec_id, cell, m-byte codes) frame. */
  private def ivfpqBuild(emb: DataFrame, nCells: Int, m: Int, ksub: Int, iters: Int)
      : (Array[Array[Float]], Array[Array[Array[Float]]], DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(emb, nCells, iters)
    val bcC = spark.sparkContext.broadcast(cents)
    // residuals: e − centroid[cell], cell kept alongside
    val residuals = ivfAssignTo(emb, cents)
      .select(col("vec_id"), col("cell"), col("embedding")).as[(Long, Long, Array[Float])]
      .map { case (id, cell, e) =>
        val cent = bcC.value(cell.toInt)
        val r = new Array[Float](e.length)
        var i = 0
        while (i < e.length) { r(i) = e(i) - cent(i); i += 1 }
        (id, cell, r)
      }.toDF("vec_id", "cell", "embedding").materialize()
    val books = pqTrain(residuals.select(col("vec_id"), col("embedding")), m, ksub, iters)
    val bcB = spark.sparkContext.broadcast(books)
    val codes = residuals.as[(Long, Long, Array[Float])]
      .map { case (id, cell, r) =>
        val bks = bcB.value
        val sub = r.length / bks.length
        val cs = new Array[Byte](bks.length)
        var j = 0
        while (j < bks.length) { cs(j) = nearestCellL2(bks(j), r, j * sub).toByte; j += 1 }
        (id, cell, cs)
      }.toDF("vec_id", "cell", "codes")
    (cents, books, codes)
  }

  /** The IVFPQ search core shared by [[ivfpqTopK]] (inline build) and
    * [[ivfpqTopKFrom]] (persisted artifact): driver-side probe plan —
    * per query its nprobe nearest cells and one residual LUT per
    * probed cell — broadcast keyed by cell; one narrow pass over the
    * (vec_id, cell, codes) rows updates per-query bounded heaps. */
  private def ivfpqSearch(codes: DataFrame, queries: DataFrame,
      cents: Array[Array[Float]], books: Array[Array[Array[Float]]],
      k: Int, nprobe: Int, maxQueryRows: Long = 1L << 16): DataFrame =
    adcSearch(codes, probePlan(queries, cents, books, nprobe, maxQueryRows), k)

  /** Driver-side probe plan: for each query its `nprobe` nearest cells
    * and one residual LUT per probed cell, grouped by cell. Computed
    * BEFORE any code row is read, so the persisted-index path can
    * prune unprobed cells' files off the scan entirely. */
  private def probePlan(queries: DataFrame,
      cents: Array[Array[Float]], books: Array[Array[Array[Float]]],
      nprobe: Int, maxQueryRows: Long): Map[Long, Array[(Long, Array[Array[Double]])]] = {
    val cNorms = norms(cents)
    val qRows = collectQueries(queries, maxQueryRows, "ivfpqSearch")
    qRows
      .flatMap { case (qid, qe) =>
        // zero-norm centroids rank −∞ (key +∞): deterministically probed
        // last, never NaN-ordered — same guard as nearestCell
        val ranked = cents.indices.sortBy { c =>
          var d = 0.0; var i = 0
          while (i < qe.length) { d += qe(i).toDouble * cents(c)(i).toDouble; i += 1 }
          val sim = if (cNorms(c) == 0.0) Double.NegativeInfinity else d / cNorms(c)
          (-sim, c)
        }.take(nprobe)
        ranked.map { c =>
          val cent = cents(c)
          val sub = qe.length / books.length
          val lut = Array.tabulate(books.length)(j => Array.tabulate(books(j).length) { cc =>
            val v = books(j)(cc)
            var s = 0.0; var t = 0
            while (t < sub) {
              val d = (qe(j * sub + t) - cent(j * sub + t)).toDouble - v(t).toDouble
              s += d * d; t += 1
            }
            s
          })
          (c.toLong, (qid, lut))
        }
      }
      .groupBy(_._1).map { case (c, arr) => c -> arr.map(_._2) }
  }

  /** One narrow pass of ADC scoring over (vec_id, cell, codes) rows
    * against a broadcast [[probePlan]], per-query bounded heaps, then
    * the per-query top-k merge window. */
  private def adcSearch(codes: DataFrame,
      cellToQueries: Map[Long, Array[(Long, Array[Array[Double]])]], k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val bcProbe = spark.sparkContext.broadcast(cellToQueries)
    val ord = implicitly[Ordering[(Double, Long)]]
    val cand = codes
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        val probe = bcProbe.value
        val heaps = scala.collection.mutable.Map.empty[Long,
          scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (id, cell, cs) =>
          probe.get(cell).foreach(_.foreach { case (qid, lut) =>
            if (qid != id) {
              var s = 0.0; var j = 0
              while (j < lut.length) { s += lut(j)(cs(j) & 0xff); j += 1 }
              val h = heaps.getOrElseUpdate(qid,
                scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
              if (h.size < k) h.enqueue((s, id))
              else if (ord.lt((s, id), h.head)) { h.dequeue(); h.enqueue((s, id)) }
            }
          })
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (dist, id) => (qid, id, dist) } }
      }
      .toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    cand.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("adist"), 6).as("adist"), col("rk"))
  }

  /** Persist the COMPLETE IVFPQ index as one artifact directory —
    * `centroids/` + `books/` (KB sidecars) and `codes/` (m bytes per
    * vector) BUCKETED BY CELL (`codes/cell=N/`). Build once per corpus
    * snapshot, then every query batch runs [[ivfpqTopKFrom]] against
    * the artifact without touching the raw vectors — the index
    * lifecycle a lake engine needs: the corpus lives in the snapshot
    * store, its search index lives beside it, both versioned by path.
    * The cell layout is the scan-pruning win: a probe plan names its
    * cells up front, so a search at nprobe ≪ nCells opens only
    * ~nprobe/nCells of the code files instead of scanning all rows and
    * filtering (spec-asserted strict file subset).
    *
    * `rotation`: an optional OPQ rotation ([[opqTrain]]) — when given,
    * IVF cells AND residual codebooks train on R·x and R persists as a
    * `rotation/` sidecar beside centroids/books, so the best-quality
    * codes flow through the whole index lifecycle ([[ivfpqTopKFrom]]
    * rotates queries automatically; [[updateIvfpqIndex]] re-encodes
    * deltas in rotated space and carries the sidecar forward).
    * Orthogonal R preserves L2, so every downstream distance is
    * exact-equivalent to searching the unrotated corpus. */
  def writeIvfpqIndex(emb: DataFrame, path: String, nCells: Int, m: Int,
      ksub: Int, iters: Int,
      rotation: Option[Array[Array[Float]]] = None): Unit = {
    val spark = emb.sparkSession
    val src = rotation.map(rotate(emb, _)).getOrElse(emb)
    val (cents, books, codes) = ivfpqBuild(src, nCells, m, ksub, iters)
    saveCentroids(spark, cents, s"$path/centroids")
    savePqBooks(spark, books, s"$path/books")
    rotation.foreach(r => saveRotation(spark, r, s"$path/rotation"))
    // staleness baseline: the build corpus's residual quantization
    // error under the freshly trained quantizer — what "fresh" means
    // for this index. One extra narrow pass at build time; the
    // incremental path compares each delta against it.
    saveGauge(spark, s"$path/gauge",
      ivfpqResidualError(src, cents, books), lastMse = None)
    writeCodes(codes, s"$path/codes")
  }

  /** Mean squared IVFPQ RESIDUAL reconstruction error of `emb` under a
    * frozen quantizer: per vector, assign the nearest cell, PQ-encode
    * the residual, decode, accumulate ‖r − r̂‖². This is the quantity
    * the index's ADC distances are built on (unlike
    * [[quantizationError]], which measures flat PQ without the IVF
    * residual step) — so its growth is exactly ADC precision decaying.
    * One narrow partition-local pass, no shuffle: cheap enough to run
    * per delta at 100 TB (the delta, not the corpus, is scanned). */
  def ivfpqResidualError(emb: DataFrame, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Double = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(cents)
    val bcB = spark.sparkContext.broadcast(books)
    val (err, n) = emb.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        val cs = bcC.value; val bks = bcB.value
        var err = 0.0; var n = 0L
        it.foreach { e =>
          val cent = cs(nearestCellL2(cs, e, 0))
          val d = e.length
          val r = new Array[Float](d)
          var i = 0
          while (i < d) { r(i) = e(i) - cent(i); i += 1 }
          val sub = d / bks.length
          var j = 0
          while (j < bks.length) {
            val cw = bks(j)(nearestCellL2(bks(j), r, j * sub))
            var t = 0
            while (t < sub) {
              val diff = r(j * sub + t) - cw(t)
              err += diff.toDouble * diff.toDouble
              t += 1
            }
            j += 1
          }
          n += 1L
        }
        Iterator.single((err, n))
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    err / math.max(n, 1L)
  }

  /** Staleness-gauge sidecar: `baseline_mse` = the build corpus's
    * residual error under the quantizer (what "fresh" means),
    * `last_mse` = the most recent delta's error under the same frozen
    * quantizer. `last/baseline` is the drift ratio retrain decisions
    * key on. Tiny single-row parquet, like the other KB sidecars. */
  def saveGauge(spark: SparkSession, path: String, baselineMse: Double,
      lastMse: Option[Double]): Unit = {
    import spark.implicits._
    Seq((baselineMse, lastMse.getOrElse(baselineMse)))
      .toDF("baseline_mse", "last_mse")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveGauge]] sidecar: (baseline_mse, last_mse). None on a
    * pre-gauge index — callers degrade to "no drift signal", never
    * fail. */
  def loadGauge(spark: SparkSession, path: String): Option[(Double, Double)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(path).collect().headOption
      .map(r => (r.getDouble(0), r.getDouble(1)))
  }

  /** The `rotation/` sidecar of an index built with an OPQ rotation,
    * or None for a plain index — one metadata existence check. */
  private def loadRotationOpt(spark: SparkSession, path: String)
      : Option[Array[Array[Float]]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(loadRotation(spark, path)) else None
  }

  private def writeCodes(codes: DataFrame, path: String): Unit =
    codes.select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** The code rows of `probed` cells ONLY: reads just those cells'
    * `cell=N` directories on the bucketed layout (`basePath` keeps the
    * partition column in the schema). Falls back to a full read on a
    * pre-bucketing flat layout — same rows, no skip. `private[graft]`
    * so the file-subset property is spec-assertable directly. */
  private[graft] def loadProbedCodes(spark: SparkSession, path: String,
      probed: Set[Long]): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("cell="))
    if (cellDirs.isEmpty) spark.read.parquet(path) // legacy flat layout
    else {
      val hit = cellDirs.filter(p => probed.contains(p.getName.drop(5).toLong))
      if (hit.isEmpty)
        spark.range(0).select(col("id").as("vec_id"), col("id").as("cell"),
          lit(Array.empty[Byte]).as("codes"))
      else spark.read.option("basePath", path).parquet(hit.map(_.toString).toIndexedSeq: _*)
    }
  }

  /** Search a [[writeIvfpqIndex]] artifact: loads the KB sidecars,
    * plans the probes driver-side, then ADC-searches ONLY the probed
    * cells' code files — identical results to the inline [[ivfpqTopK]]
    * built from the same corpus (spec-proven), reading
    * ~nprobe/nCells of the index.
    *
    * `allowedIds` — FILTERED search through the PERSISTED index (the
    * ann_filtered contract at index scale): a one-column frame of
    * admissible vec_ids (a metadata predicate's projection, e.g.
    * `meta.filter(label === 3).select("vec_id")`). The filter applies
    * INSIDE the probed cells, BEFORE the per-query heaps — a
    * pre-filter, so every returned row satisfies it and k slots never
    * silently shrink the way post-filtering a top-k would. Plan
    * shape: the probed cells' code rows (already a ~nprobe/nCells
    * file subset) semi-join the id frame on vec_id — an equi-join
    * Catalyst broadcasts when the admissible set is small, never a
    * scan of unprobed cells. */
  def ivfpqTopKFrom(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int, maxQueryRows: Long = 1L << 16,
      allowedIds: Option[DataFrame] = None): DataFrame = {
    val cents = loadCentroids(spark, s"$path/centroids")
    val books = loadPqBooks(spark, s"$path/books")
    // OPQ-built index: queries rotate through the sidecar R (narrow
    // map over the small query set), everything downstream unchanged
    val q = loadRotationOpt(spark, s"$path/rotation")
      .map(rotate(queries, _)).getOrElse(queries)
    val plan = probePlan(q, cents, books, nprobe, maxQueryRows)
    val codes = loadProbedCodes(spark, s"$path/codes", plan.keySet)
    val admitted = allowedIds.fold(codes)(ids => codes.join(
      ids.select(col(ids.columns.head).cast("long").as("vec_id")).distinct(),
      Seq("vec_id"), "left_semi"))
    adcSearch(admitted, plan, k)
  }

  /** Encode vectors against a FROZEN IVFPQ quantizer (centroids +
    * codebooks): assign each vector its nearest cell, subtract the
    * centroid, PQ-encode the residual — identical math to the
    * build-time encoding, one narrow typed map. Freezing the quantizer
    * is what makes incremental index updates sound: codes produced at
    * different times stay mutually ADC-comparable. */
  def ivfpqEncode(emb: DataFrame, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(cents)
    val bcB = spark.sparkContext.broadcast(books)
    ivfAssignTo(emb, cents)
      .select(col("vec_id"), col("cell"), col("embedding")).as[(Long, Long, Array[Float])]
      .map { case (id, cell, e) =>
        val cent = bcC.value(cell.toInt)
        val bks = bcB.value
        val r = new Array[Float](e.length)
        var i = 0
        while (i < e.length) { r(i) = e(i) - cent(i); i += 1 }
        val sub = r.length / bks.length
        val cs = new Array[Byte](bks.length)
        var j = 0
        while (j < bks.length) { cs(j) = nearestCellL2(bks(j), r, j * sub).toByte; j += 1 }
        (id, cell, cs)
      }.toDF("vec_id", "cell", "codes")
  }

  /** Incremental index maintenance after a copy-on-write merge — the
    * missing composition that used to force a full index rebuild after
    * every [[SnapshotStore.mergeDelta]]: carry the code rows of
    * vectors whose files the merge left untouched, re-encode ONLY the
    * vectors in files the merge rewrote, against the FROZEN quantizer
    * of the existing index.
    *
    * File identity does the bookkeeping: a CoW merge byte-copies
    * untouched files under the SAME basename, so basenames present in
    * both versions hold bit-identical vectors (codes carry), basenames
    * only in `fromVersion` held the rewritten/deleted rows (their codes
    * drop via one anti-join over the m-bytes-per-vector codes sidecar),
    * and basenames only in `toVersion` hold the merged content (encode,
    * O(|rewritten|) vector encodes). The result is bit-exact with
    * re-encoding the whole new version under the same quantizer
    * (spec-proven).
    *
    * Staleness gauge + retrain trigger: each delta's residual error
    * under the frozen quantizer ([[ivfpqResidualError]], O(|delta|))
    * updates the `gauge/` sidecar against the build-time baseline.
    * When `retrainRatio` is set and `delta_mse > ratio × baseline`,
    * the frozen carry is ABANDONED for this version: the quantizer
    * retrains on the full new corpus with the index's own
    * hyper-parameters (a [[writeIvfpqIndex]] rebuild — fresh cells,
    * books, codes, and baseline), because codes of drifted vectors
    * under stale cells/books degrade ADC precision no matter how
    * correctly they carry. Without `retrainRatio` the gauge still
    * updates, so an external policy can watch `loadGauge` and schedule
    * rebuilds off-peak. Returns (codesCarried, codesReencoded) —
    * a retrain reports (0, |corpus|). */
  def updateIvfpqIndex(spark: SparkSession, store: SnapshotStore,
      fromVersion: Long, toVersion: Long,
      fromIndexPath: String, toIndexPath: String,
      retrainRatio: Option[Double] = None): (Long, Long) = {
    require(fromIndexPath != toIndexPath,
      "updateIvfpqIndex writes a new index version; in-place update would read and " +
        "overwrite the same codes files")
    val cents = loadCentroids(spark, s"$fromIndexPath/centroids")
    val books = loadPqBooks(spark, s"$fromIndexPath/books")
    // an OPQ-built index re-encodes deltas in rotated space and hands
    // the sidecar to the new version — the frozen quantizer includes R
    val rot = loadRotationOpt(spark, s"$fromIndexPath/rotation")
    val fromFiles = store.dataFiles(fromVersion).map(p => p.getName -> p.toString).toMap
    val toFiles = store.dataFiles(toVersion).map(p => p.getName -> p.toString).toMap
    val removed = (fromFiles.keySet -- toFiles.keySet).toSeq.sorted.map(fromFiles)
    val added = (toFiles.keySet -- fromFiles.keySet).toSeq.sorted.map(toFiles)
    val freshRaw =
      if (added.isEmpty) None
      else Some(spark.read.parquet(added: _*))
    // delta staleness under the frozen quantizer (in rotated space,
    // where the quantizer lives)
    val baseline = loadGauge(spark, s"$fromIndexPath/gauge")
    val deltaMse = freshRaw.map(raw =>
      ivfpqResidualError(rot.map(rotate(raw, _)).getOrElse(raw), cents, books))
    val drifted = (for {
      ratio <- retrainRatio; (b, _) <- baseline; d <- deltaMse
    } yield d > ratio * b).getOrElse(false)
    if (drifted) {
      // quantizer no longer fits the corpus: rebuild with the index's
      // own hyper-parameters (cells/m/ksub read from the artifacts)
      val corpus = store.read(toVersion)
      writeIvfpqIndex(corpus, toIndexPath,
        nCells = cents.length, m = books.length, ksub = books(0).length,
        iters = 2, rotation = rot)
      (0L, corpus.count())
    } else {
      val oldCodes = spark.read.parquet(s"$fromIndexPath/codes")
        .select(col("vec_id").cast("long"), col("cell").cast("long"), col("codes"))
      val carried =
        if (removed.isEmpty) oldCodes
        else oldCodes.join(
          spark.read.parquet(removed: _*).select(col("vec_id").cast("long")),
          Seq("vec_id"), "left_anti")
      val fresh = freshRaw.map(raw =>
        ivfpqEncode(rot.map(rotate(raw, _)).getOrElse(raw), cents, books))
      val newCodes = fresh.foldLeft(carried)(_ unionByName _).materialize()
      saveCentroids(spark, cents, s"$toIndexPath/centroids")
      savePqBooks(spark, books, s"$toIndexPath/books")
      rot.foreach(r => saveRotation(spark, r, s"$toIndexPath/rotation"))
      baseline.foreach { case (b, last) =>
        saveGauge(spark, s"$toIndexPath/gauge", b,
          lastMse = deltaMse.orElse(Some(last)))
      }
      writeCodes(newCodes, s"$toIndexPath/codes")
      val nFresh = fresh.map(_.count()).getOrElse(0L)
      (newCodes.count() - nFresh, nFresh)
    }
  }

  /** IVF cell count from corpus size: ~√n (the classic IVF sizing —
    * balances |cells| probe cost against |n/cells| within-cell scan,
    * both ~√n at the optimum), clamped so tiny corpora don't degenerate
    * to one-vector cells and huge ones don't exceed what a broadcast
    * centroid table supports (65k × dim floats ≈ a few MB — still
    * broadcast-friendly at 100 TB corpus scale, where √n would
    * overshoot it anyway only past 4×10⁹ vectors). */
  def autoCells(n: Long): Int =
    math.min(math.max(1L, math.round(math.sqrt(n.toDouble))), 65536L).toInt

  /** [[ivfTopK]] with the cell count auto-tuned from the corpus size —
    * one count over a single column (cheap columnar scan) decides
    * nCells, so the operator self-sizes as the corpus grows instead of
    * carrying a hand-picked constant across 1000× scale changes. */
  def ivfTopKAuto(emb: DataFrame, k: Int, salt: Int = 1,
      kmeansIters: Int = 0): DataFrame = {
    val n = emb.select(col("vec_id")).count()
    ivfTopK(emb, autoCells(n), k, salt, kmeansIters)
  }

  // ---- OPQ: optimized product quantization (learned rotation) ----

  /** Rotate every embedding by the d×d matrix `r` (rows): y = R·x.
    * One narrow typed map — d² flops per row, no shuffle. Kept LAZY on
    * purpose: at 100 TB, recomputing a gemv per downstream scan beats
    * materializing a second full-width copy of the corpus. */
  def rotate(emb: DataFrame, r: Array[Array[Float]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(r)
    emb.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, x) => (id, rotateOne(bc.value, x)) }
      .toDF("vec_id", "embedding")
  }

  private def rotateOne(rm: Array[Array[Float]], x: Array[Float]): Array[Float] = {
    val y = new Array[Float](rm.length)
    var i = 0
    while (i < rm.length) {
      val row = rm(i)
      var s = 0.0; var j = 0
      while (j < row.length) { s += row(j).toDouble * x(j).toDouble; j += 1 }
      y(i) = s.toFloat; i += 1
    }
    y
  }

  /** One corpus pass shared by the OPQ rotation solve and
    * [[quantizationError]]: per vector, rotate (y = R·x), PQ-encode y,
    * decode to ŷ, and accumulate the d×d Procrustes scatter
    * M = Σ ŷ·xᵀ plus Σ‖y − ŷ‖² and the row count. Per-partition state
    * is d² doubles (dim-64 → 32 KB) — the vectors never move, the
    * reduce carries |partitions| tiny matrices. */
  private def opqScatter(emb: DataFrame, r: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): (Array[Double], Double, Long) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcR = spark.sparkContext.broadcast(r)
    val bcB = spark.sparkContext.broadcast(books)
    emb.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        val (rm, bks) = (bcR.value, bcB.value)
        val d = rm.length
        val m = bks.length; val sub = d / m
        val mAcc = new Array[Double](d * d)
        var err = 0.0; var n = 0L
        it.foreach { x =>
          val y = rotateOne(rm, x)
          var j = 0
          while (j < m) {
            val cw = bks(j)(nearestCellL2(bks(j), y, j * sub))
            var t = 0
            while (t < sub) {
              val yh = cw(t).toDouble
              val base = (j * sub + t) * d
              var q = 0
              while (q < d) { mAcc(base + q) += yh * x(q).toDouble; q += 1 }
              val dif = y(j * sub + t).toDouble - yh
              err += dif * dif
              t += 1
            }
            j += 1
          }
          n += 1
        }
        Iterator.single((mAcc, err, n))
      }
      .reduce { (a, b) =>
        val s = new Array[Double](a._1.length)
        var i = 0
        while (i < s.length) { s(i) = a._1(i) + b._1(i); i += 1 }
        (s, a._2 + b._2, a._3 + b._3)
      }
  }

  /** Orthogonal-Procrustes solve: the R minimizing Σ‖R·xᵢ − ŷᵢ‖² over
    * orthogonal matrices is U·Vᵀ from the SVD of the scatter
    * M = Σ ŷᵢ·xᵢᵀ. Driver-side on a d×d matrix (dim-64 → 4096 cells)
    * via breeze (bundled with Spark — no new dependency). */
  private def procrustes(mFlat: Array[Double], d: Int): Array[Array[Float]] = {
    import breeze.linalg.{svd, DenseMatrix}
    val mm = DenseMatrix.tabulate(d, d)((i, j) => mFlat(i * d + j))
    val svd.SVD(u, _, vt) = svd(mm)
    val rm = u * vt
    Array.tabulate(d)(i => Array.tabulate(d)(j => rm(i, j).toFloat))
  }

  /** Parametric OPQ initialization (Ge et al., CVPR'13): rotate into
    * the covariance eigenbasis, with eigen-directions dealt to the m
    * subspaces greedily balancing per-subspace variance products (the
    * independent-Gaussian-optimal allocation). This is the step that
    * escapes the identity's local minimum: the non-parametric
    * alternation alone barely moves when the optimal rotation is far
    * from the start (a 45° cross-subspace mix measurably stalls it).
    * One narrow pass accumulates mean + second moment (d + d² doubles
    * per partition); the d×d eigensolve runs driver-side via breeze. */
  private def eigInit(emb: DataFrame, m: Int): Array[Array[Float]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (m2, mu, n) = emb.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        var m2: Array[Double] = null
        var mu: Array[Double] = null
        it.foreach { x =>
          if (m2 == null) { m2 = new Array(x.length * x.length); mu = new Array(x.length) }
          var i = 0
          while (i < x.length) {
            val xi = x(i).toDouble
            mu(i) += xi
            val base = i * x.length
            var j = 0
            while (j < x.length) { m2(base + j) += xi * x(j).toDouble; j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator.single((m2, mu, n))
      }
      .reduce { (a, b) =>
        val s2 = new Array[Double](a._1.length)
        var i = 0
        while (i < s2.length) { s2(i) = a._1(i) + b._1(i); i += 1 }
        val sm = new Array[Double](a._2.length)
        i = 0
        while (i < sm.length) { sm(i) = a._2(i) + b._2(i); i += 1 }
        (s2, sm, a._3 + b._3)
      }
    val d = mu.length
    import breeze.linalg.{eigSym, DenseMatrix}
    val cov = DenseMatrix.tabulate(d, d)((i, j) =>
      m2(i * d + j) / n - (mu(i) / n) * (mu(j) / n))
    val es = eigSym(cov) // eigenvalues ascending, eigenvectors as columns
    val ord = (0 until d).sortBy(i => -es.eigenvalues(i))
    val sub = d / m
    val logVar = Array.fill(m)(0.0)
    val slots = Array.fill(m)(0)
    val rows = new Array[Int](d)
    ord.foreach { e =>
      val j = (0 until m).filter(slots(_) < sub)
        .minBy(b => (logVar(b), b))
      rows(j * sub + slots(j)) = e
      logVar(j) += math.log(math.max(es.eigenvalues(e), 1e-12))
      slots(j) += 1
    }
    Array.tabulate(d)(i => Array.tabulate(d)(j => es.eigenvectors(j, rows(i)).toFloat))
  }

  /** Train an OPQ rotation + codebooks (Ge et al., CVPR'13): start
    * from the parametric eigen-allocation rotation ([[eigInit]]), then
    * alternate { retrain PQ codebooks on the rotated corpus
    * ([[pqTrain]] — fused Lloyd); re-solve the orthogonal Procrustes
    * rotation against the reconstructions ([[opqScatter]] + d×d SVD) },
    * ending on a codebook retrain so the returned pair is mutually
    * consistent. Plain PQ cuts the space into FIXED axis-aligned
    * subspaces; when variance is correlated across that grid, the
    * learned orthogonal rotation aligns the data to it first — same
    * code size, measurably lower quantization error. Both alternation
    * steps minimize the same reconstruction objective, so the error is
    * non-increasing across iterations. Cost: opqIters × (lloydIters
    * + 2) narrow corpus passes; like PQ codebooks, train on a sample
    * in production. opqIters = 0 skips rotation learning entirely
    * (identity — exactly [[pqTrain]]). */
  def opqTrain(emb: DataFrame, m: Int, ksub: Int, lloydIters: Int,
      opqIters: Int): (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    require(d % m == 0, s"opqTrain: dim=$d not divisible by m=$m")
    var r =
      if (opqIters == 0) Array.tabulate(d)(i => Array.tabulate(d)(j => if (i == j) 1f else 0f))
      else eigInit(emb, m)
    var books: Array[Array[Array[Float]]] = null
    for (_ <- 0 until opqIters) {
      books =
        if (books == null) pqTrain(rotate(emb, r), m, ksub, lloydIters)
        else pqRefine(rotate(emb, r), books, lloydIters)
      val (scatter, _, _) = opqScatter(emb, r, books)
      r = procrustes(scatter, d)
    }
    val finalBooks =
      if (books == null) pqTrain(rotate(emb, r), m, ksub, lloydIters)
      else pqRefine(rotate(emb, r), books, lloydIters)
    (r, finalBooks)
  }

  /** Mean squared PQ reconstruction error of the corpus under rotation
    * `r` and codebooks `books` — the quantity OPQ's alternation
    * minimizes. Identity rotation measures plain PQ. One narrow pass. */
  def quantizationError(emb: DataFrame, r: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Double = {
    val (_, err, n) = opqScatter(emb, r, books)
    err / math.max(n, 1L)
  }

  /** PQ-encode under the OPQ rotation: codes of R·x. */
  def opqEncode(emb: DataFrame, r: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): DataFrame =
    pqEncode(rotate(emb, r), books)

  /** ADC top-k over OPQ codes: queries rotate through the same R (a
    * narrow map over the small query set), then [[pqTopK]] answers
    * against the coded corpus — rotation preserves L2 distances, so
    * the ADC machinery is unchanged. */
  def opqTopK(queries: DataFrame, codes: DataFrame, r: Array[Array[Float]],
      books: Array[Array[Array[Float]]], k: Int,
      maxQueryRows: Long = 1L << 16): DataFrame =
    pqTopK(rotate(queries, r), codes, books, k, maxQueryRows)

  /** Rotation matrix → a tiny parquet sidecar (row, embedding), like
    * [[saveCentroids]]. */
  def saveRotation(spark: SparkSession, r: Array[Array[Float]], path: String): Unit = {
    import spark.implicits._
    r.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("row", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveRotation]] sidecar, bit-exact. */
  def loadRotation(spark: SparkSession, path: String): Array[Array[Float]] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("row").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
  }

  /** Shared lifecycle behind `ann_ivfpq_incr` and
    * `ann_ivfpq_incr_recall`: embeddings range-partitioned as v1 with
    * a persisted IVFPQ index, one CoW merge (rescale ≡3 mod 7, append
    * ≡7 mod 29 shifted past the envelope, delete ≡5 mod 11) to v2,
    * index advanced incrementally. Fingerprint-keyed cache dir: both
    * entries (and repeat bench runs) reuse one build. Returns (store,
    * v2 index path). */
  private def ivfpqIncrArtifact(s: SparkSession, d: String): (SnapshotStore, String) = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_incr_${Tables.fingerprint(s, d, "embeddings")}"
    val store = new SnapshotStore(s, base, "vec_id")
    val emb = Tables.embeddings(s, d)
    if (!store.versions().contains(1L)) store.writeRangePartitioned(emb, 1L, 8)
    val idx1 = s"$base/idx_v1"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$idx1/codes/_SUCCESS")))
      writeIvfpqIndex(store.read(1L), idx1, nCells = 32, m = 8, ksub = 16, iters = 2)
    val idx2 = s"$base/idx_v2"
    if (!store.versions().contains(2L)) {
      val updates = emb.filter(col("vec_id") % 7 === 3)
        .withColumn("embedding",
          transform(col("embedding"), x => (x * lit(1.5f)).cast("float")))
      val inserts = emb.filter(col("vec_id") % 29 === 7)
        .withColumn("vec_id", col("vec_id") + 10000000L)
        .withColumn("embedding", reverse(col("embedding")))
      val dels = emb.filter(col("vec_id") % 11 === 5 && col("vec_id") % 7 =!= 3)
        .select("vec_id")
      store.mergeDelta(1L, 2L, updates.unionByName(inserts), Some(dels))
      updateIvfpqIndex(s, store, 1L, 2L, idx1, idx2)
    }
    (store, idx2)
  }

  /** The shared PERSISTED OPQ-IVFPQ artifact over the full embeddings
    * corpus (build-once-per-fingerprint; serves ann_opq_ivfpq and the
    * filtered-search entries). */
  private def opqIvfpqArtifact(s: SparkSession, d: String): String = {
    val emb = Tables.embeddings(s, d)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_opq_ivfpq_${Tables.fingerprint(s, d, "embeddings")}"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes/_SUCCESS"))) {
      val (r, _) = opqTrain(emb.filter(col("vec_id") % 4 === 0),
        8, 16, lloydIters = 2, opqIters = 2)
      writeIvfpqIndex(emb, path, nCells = 32, m = 8, ksub = 16, iters = 2,
        rotation = Some(r))
    }
    path
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      bruteForceTopK(emb.filter(col("vec_id") < 50), emb, 5)
        .orderBy("query_id", "rk")
    },

    "ann_mips" -> { (s, d) =>
      // Exact maximum-inner-product top-k (hash-checked): the scoring
      // order cosine/L2 get WRONG when magnitude carries signal.
      val emb = Tables.embeddings(s, d)
      mipsTopK(emb.filter(col("vec_id") < 50), emb, 5)
        .orderBy("query_id", "rk")
    },

    "ann_mips_recall" -> { (s, d) =>
      // Recall gate for the augmented-LSH MIPS path vs the exact
      // inner-product TRUE TOP NEIGHBOR on planted queries — same
      // contract as the other five gates: DuckDB asserts the boolean.
      val emb = Tables.embeddings(s, d)
      val q = plantedQueries(emb, 50)
      recallSummary(mipsLshTopKFor(q, emb, 12, 5, probes = 4),
        mipsTopK(q, emb, 1), k = 5, threshold = 0.7)
    },

    "ann_filtered" -> { (s, d) =>
      // FILTERED vector search — top-k under a metadata predicate
      // (label = 3), the retrieval mode every production vector store
      // serves ("similar docs from source X only"). Pre-filtering the
      // corpus BEFORE the scored join is both exact and cheaper (the
      // predicate prunes at the parquet scan); post-filtering a top-k
      // would silently return < k. The IVF/LSH scale paths compose the
      // same way: the filter applies inside each probed cell.
      val emb = Tables.embeddings(s, d)
      bruteForceTopK(emb.filter(col("vec_id") < 50),
          emb.filter(col("label") === 3), 5)
        .orderBy("query_id", "rk")
    },

    "ann_range" -> { (s, d) =>
      // All neighbors within cosine 0.35 of the first 50 vectors — the
      // threshold retrieval mode top-k can't express (τ sits at the
      // ~99.9th percentile of this corpus's pair cosines, so the
      // result is a real selective radius set at every SF).
      val emb = Tables.embeddings(s, d)
      rangeSearch(emb.filter(col("vec_id") < 50), emb, 0.35)
        .orderBy("query_id", "neighbor_id")
    },

    "ann_mmr" -> { (s, d) =>
      // Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
      // SIGIR 1998): greedy-select 10 results that balance relevance
      // to the query against redundancy with what's already selected
      // (score = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s), λ=0.7) — the
      // diversification plain top-k can't express (its top ranks are
      // near-duplicates of each other by construction).
      // Shape: MMR re-ranks a RETRIEVED POOL, not the corpus — the
      // distributed work is the brute-force top-100 retrieval and the
      // pool's pairwise cosines (pool² = 10k rows, SAME rounded-cosine
      // expression as the retrieval so the oracle replays both); the
      // greedy loop then runs on driver-side frames BOUNDED BY
      // CONSTRUCTION at pool size (the compactBigramLm collect
      // contract), because each pick depends on the previous — there
      // is no distributed formulation that isn't k sequential jobs
      // over 100 rows. Scores combine already-rounded sims with fixed
      // double arithmetic, so the unrolled-CTE oracle's comparisons
      // are bit-identical.
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val pool = bruteForceTopK(emb.filter(col("vec_id") === 0), emb, 100)
        .select(col("neighbor_id").as("vid"), col("cos").as("simq"))
        .materialize() // feeds the pairwise join + the collect
      val pv = Tables.embeddings(s, d)
        .join(pool, col("vec_id") === col("vid"))
        .select(col("vid"), col("embedding"))
      val a = pv.select(col("vid").as("ida"), col("embedding").as("ea"))
      val b = pv.select(col("vid").as("idb"), col("embedding").as("eb"))
      val psim = a.join(b, col("ida") < col("idb"))
        .select(col("ida"), col("idb"),
          round(dot(col("ea"), col("eb")) / (l2norm(col("ea")) * l2norm(col("eb"))), 4)
            .as("cs"))
      val simq = pool.as[(Long, Double)].collect().toMap
      val cs = psim.as[(Long, Long, Double)].collect()
        .map { case (x, y, c) => (x, y) -> c }.toMap
      def pairSim(x: Long, y: Long): Double =
        if (x < y) cs((x, y)) else cs((y, x))
      // λ and (1−λ) as INDEPENDENT literals: `1 - 0.7` in IEEE is
      // 0.30000000000000004, which would diverge from the oracle's 0.3
      val lam = 0.7
      val mu = 0.3
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      for (rk <- 1 to 10) {
        val pick = simq.keysIterator
          .filterNot(v => selected.exists(_._2 == v))
          .map { v =>
            val red = if (selected.isEmpty) 0.0
              else selected.iterator.map(sel => pairSim(v, sel._2)).max
            (v, lam * simq(v) - mu * red)
          }
          .minBy { case (v, sc) => (-sc, v) }
        selected += ((rk.toLong, pick._1, pick._2))
      }
      selected.toSeq.toDF("rk", "vec_id", "score")
        .select(col("rk"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("rk")
    },

    "emb_int8" -> { (s, d) =>
      int8QuantAudit(Tables.embeddings(s, d)).orderBy("vec_id")
    },

    "emb_stats" -> { (s, d) =>
      // Embedding-space health report per label: count, mean/min/max
      // L2 norm, and degenerate (near-zero-norm) vectors — the gate an
      // ingest pipeline runs before an index build (a batch of zero or
      // exploded norms means the encoder upstream broke). Norms via
      // the codegen'd FloatVecNorm, rounded then summed as exact
      // decimals so the mean is order-independent; one narrow pass +
      // one tiny aggregate, no shuffle of vector payloads.
      Tables.embeddings(s, d)
        .select(col("label").cast(LongType).as("label"),
          round(l2norm(col("embedding")), 6).as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(sum(col("nrm").cast(DecimalType(12, 6))).cast(DoubleType) / count(lit(1)), 4)
            .as("avg_norm"),
          round(min(col("nrm")), 6).as("min_norm"),
          round(max(col("nrm")), 6).as("max_norm"),
          sum(when(col("nrm") < 0.000001, 1L).otherwise(0L)).as("n_degenerate"))
        .orderBy("label")
    },

    "ann_lsh" -> { (s, d) =>
      // Rows-only oracle: bucket membership depends on Spark murmur3.
      // Multi-probe (4 Hamming-1 probes) — the recall fix that costs
      // query-side fan-out, not more corpus hash tables.
      lshTopK(Tables.embeddings(s, d), 12, 5, probes = 4).orderBy("query_id", "rk")
    },

    "ann_ivf" -> { (s, d) =>
      // Rows-only oracle (cell assignment is an internal artifact).
      // Cell count auto-tuned (~√n) from the corpus; two Lloyd's
      // iterations refine the first-N seed centroids.
      ivfTopKAuto(Tables.embeddings(s, d), 5, kmeansIters = 2).orderBy("query_id", "rk")
    },

    "ann_ivf_probe" -> { (s, d) =>
      // Rows-only oracle. Multi-probe plain IVF: 50 queries each visit
      // their 3 nearest of the k-means cells; corpus state stays
      // single-cell.
      val emb = Tables.embeddings(s, d)
      val cents = kmeansCentroids(emb, autoCells(emb.count()), 2)
      ivfTopKProbed(emb.filter(col("vec_id") < 50), emb, cents, k = 5, nprobe = 3)
        .orderBy("query_id", "rk")
    },

    "ann_ivfpq" -> { (s, d) =>
      // Rows-only oracle. The composed index: 32 k-means cells route
      // each query to its 4 nearest, residual PQ codes (8×16) answer
      // distances inside them.
      val emb = Tables.embeddings(s, d)
      ivfpqTopK(emb, emb.filter(col("vec_id") < 50),
        nCells = 32, m = 8, ksub = 16, iters = 2, k = 5, nprobe = 4)
        .orderBy("query_id", "rk")
    },

    "ann_ivfpq_incr" -> { (s, d) =>
      // Rows-only oracle. The index MAINTENANCE lifecycle end-to-end:
      // embeddings land range-partitioned as v1 with a persisted IVFPQ
      // index; a CoW merge (rescaled vectors ≡ 3 mod 7, appended ids
      // past the envelope, deleted ids ≡ 5 mod 11) publishes v2; the
      // index updates INCREMENTALLY — codes carry for untouched files,
      // only rewritten files' vectors re-encode under the frozen
      // quantizer — and the search runs against the updated artifact,
      // reading only probed cells' code files.
      val (store, idx2) = ivfpqIncrArtifact(s, d)
      ivfpqTopKFrom(s, idx2, store.read(2L).filter(col("vec_id") < 50),
        k = 5, nprobe = 4)
        .orderBy("query_id", "rk")
    },

    "ann_ivfpq_incr_recall" -> { (s, d) =>
      // HASH-CHECKED recall gate on the INCREMENTALLY MAINTAINED index
      // (the other four gates test freshly built indexes only): planted
      // near-duplicate queries over the MERGED corpus must recover
      // their true neighbors from ann_ivfpq_incr's carry/re-encode
      // artifact — proving codes produced at different times stay
      // mutually ADC-comparable in a searchable index, not just
      // bit-exact in a spec. Same one-row boolean shape as the other
      // gates; the oracle replicates the merge's id arithmetic.
      val (store, idx2) = ivfpqIncrArtifact(s, d)
      val v2 = store.read(2L)
      val q = plantedQueries(v2, 50)
      recallSummary(
        ivfpqTopKFrom(s, idx2, q, k = 5, nprobe = 4),
        bruteForceTopKL2(q, v2, 1), k = 5, threshold = 0.7)
    },

    "ann_opq" -> { (s, d) =>
      // Rows-only oracle (rotation and codebooks are Spark-internal
      // artifacts). OPQ = PQ behind a learned orthogonal rotation:
      // same 8-byte codes as ann_pq, lower quantization error when
      // variance is correlated across the fixed subspace grid. Trains
      // on the same deterministic 25% sample as ann_pq.
      val emb = Tables.embeddings(s, d)
      val (r, books) =
        opqTrain(emb.filter(col("vec_id") % 4 === 0), 8, 16, lloydIters = 2, opqIters = 2)
      opqTopK(emb.filter(col("vec_id") < 50), opqEncode(emb, r, books), r, books, 5)
        .orderBy("query_id", "rk")
    },

    "ann_lsh_recall" -> { (s, d) =>
      // HASH-CHECKED quality gate (the rows-only ann_* entries assert
      // nothing about recall): 50 planted queries, LSH top-5 must
      // contain the in-query exact cosine TRUE NEAREST NEIGHBOR,
      // reduced to one row whose recall_ok boolean DuckDB can assert.
      // Threshold 0.7 sits well under the measured 0.96 (sf0.01) /
      // 0.92 (sf0.1) — plane flips cost a few planted queries — and
      // well above the broken-index regime (~0.0 on random data).
      val emb = Tables.embeddings(s, d)
      val q = plantedQueries(emb, 50)
      recallSummary(lshTopKFor(q, emb, 12, 5, probes = 4),
        bruteForceTopK(q, emb, 1), k = 5, threshold = 0.7)
    },

    "ann_ivf_recall" -> { (s, d) =>
      // IVF multi-probe recall gate vs exact cosine on planted queries.
      val emb = Tables.embeddings(s, d)
      val q = plantedQueries(emb, 50)
      val cents = kmeansCentroids(emb, autoCells(emb.count()), 2)
      recallSummary(ivfTopKProbed(q, emb, cents, k = 5, nprobe = 3),
        bruteForceTopK(q, emb, 1), k = 5, threshold = 0.7)
    },

    "ann_ivfpq_recall" -> { (s, d) =>
      // IVFPQ recall gate vs exact EUCLIDEAN top-k (ADC ranks by L2).
      val emb = Tables.embeddings(s, d)
      val q = plantedQueries(emb, 50)
      recallSummary(
        ivfpqTopK(emb, q, nCells = 32, m = 8, ksub = 16, iters = 2, k = 5, nprobe = 4),
        bruteForceTopKL2(q, emb, 1), k = 5, threshold = 0.7)
    },

    "ann_opq_recall" -> { (s, d) =>
      // OPQ recall gate vs exact EUCLIDEAN top-k, same train/search
      // config as ann_opq.
      val emb = Tables.embeddings(s, d)
      val q = plantedQueries(emb, 50)
      val (r, books) =
        opqTrain(emb.filter(col("vec_id") % 4 === 0), 8, 16, lloydIters = 2, opqIters = 2)
      recallSummary(opqTopK(q, opqEncode(emb, r, books), r, books, 5),
        bruteForceTopKL2(q, emb, 1), k = 5, threshold = 0.7)
    },

    "ann_opq_ivfpq" -> { (s, d) =>
      // Rows-only oracle. OPQ composed through the PERSISTED index
      // lifecycle: the rotation trains on the deterministic 25% sample,
      // then IVF cells AND residual codebooks train on R·x and R rides
      // beside them as a sidecar — ivfpqTopKFrom rotates the queries
      // automatically, so the artifact serves the best-quality codes
      // with the same cell-pruned reads as ann_ivfpq.
      val emb = Tables.embeddings(s, d)
      ivfpqTopKFrom(s, opqIvfpqArtifact(s, d), emb.filter(col("vec_id") < 50),
        k = 5, nprobe = 4)
        .orderBy("query_id", "rk")
    },

    "ann_ivfpq_filtered" -> { (s, d) =>
      // Rows-only oracle. FILTERED search through the PERSISTED index
      // — the ann_filtered contract at index scale: the metadata
      // predicate (label = 3) projects to an id frame that
      // pre-filters INSIDE the probed cells, BEFORE the per-query
      // heaps, so k slots never silently shrink the way
      // post-filtering a top-k would; the cell-pruned file reads are
      // unchanged (the filter composes with, never widens, the probe
      // plan). Shares ann_opq_ivfpq's artifact.
      val emb = Tables.embeddings(s, d)
      ivfpqTopKFrom(s, opqIvfpqArtifact(s, d), emb.filter(col("vec_id") < 50),
        k = 5, nprobe = 4,
        allowedIds = Some(emb.filter(col("label") === 3).select("vec_id")))
        .orderBy("query_id", "rk")
    },

    "ann_ivfpq_filtered_recall" -> { (s, d) =>
      // HASH-CHECKED gate for the filtered persisted-index search:
      // planted near-duplicates of label-3 vectors must recover their
      // true (label-3) sources THROUGH the filter (recall >= 0.7),
      // and ZERO returned neighbors may violate the predicate — both
      // inside the hashed row. 40 planted queries (sf0.001's label-3
      // census bounds the batch).
      val emb = Tables.embeddings(s, d)
      val allowed = emb.filter(col("label") === 3)
      val q = allowed.orderBy("vec_id").limit(40).select(
        (col("vec_id") + lit(1L << 40)).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => (a * lit(0.99f) + lit(0.02f) * b).cast("float")).as("embedding"))
        .materialize() // consumed by search + exact baseline
      val approx = ivfpqTopKFrom(s, opqIvfpqArtifact(s, d), q,
        k = 5, nprobe = 4,
        allowedIds = Some(allowed.select("vec_id"))).materialize()
      val violations = approx.join(emb,
          approx("neighbor_id") === emb("vec_id"))
        .filter(col("label") =!= 3).count()
      recallSummary(approx, bruteForceTopKL2(q, allowed, 1),
          k = 5, threshold = 0.7)
        .withColumn("filter_ok", lit(violations == 0L))
    },

    "ann_pq" -> { (s, d) =>
      // Rows-only oracle (codes/codebooks are Spark-internal
      // artifacts). dim-64 → 8 subspaces × 16 centroids: 8-byte codes,
      // ADC search over the compressed corpus. Codebooks train on a
      // deterministic 25% sample — the standard PQ practice (codebooks
      // are corpus statistics; the m × iters training passes then scan
      // a fraction of the corpus, and at 100 TB a sample is the only
      // sane training set).
      val emb = Tables.embeddings(s, d)
      val books = pqTrain(emb.filter(col("vec_id") % 4 === 0), 8, 16, 2)
      pqTopK(emb.filter(col("vec_id") < 50), pqEncode(emb, books), books, 5)
        .orderBy("query_id", "rk")
    }
  )

  // The recall gates' one-row shape is fully DuckDB-predictable: the
  // query count comes from the table, k is pinned, and recall_ok must
  // read TRUE — an index whose recall drops under the threshold
  // hash-fails CORRECTNESS even though buckets/codes are Spark-internal.
  private val recallOracle =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
      |TRUE AS recall_ok FROM embeddings WHERE vec_id < 50""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_ivfpq_filtered_recall" ->
      """SELECT CAST(LEAST(40, (SELECT COUNT(*) FROM embeddings WHERE label = 3))
        |  AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |TRUE AS recall_ok, TRUE AS filter_ok""".stripMargin,
    "ann_lsh_recall" -> recallOracle,
    "ann_ivf_recall" -> recallOracle,
    "ann_ivfpq_recall" -> recallOracle,
    "ann_opq_recall" -> recallOracle,

    // the incr gate's query set is v2's ids < 50: v1 minus the merge's
    // deletions (inserts land far above 50)
    "ann_ivfpq_incr_recall" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 50 AND NOT (vec_id % 11 = 5 AND vec_id % 7 <> 3)""".stripMargin,

    "ann_mips" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    ROUND(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 4) AS ip
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT query_id, neighbor_id, ip, rk FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS BIGINT) AS rk
        |  FROM pairs) t
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_mips_recall" -> recallOracle,

    "ann_filtered" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    ROUND(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON b.vec_id <> a.vec_id AND b.label = 3
        |  WHERE a.vec_id < 50)
        |SELECT query_id, neighbor_id, cos, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM pairs) t
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_range" ->
      """SELECT * FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    ROUND(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 50) t
        |WHERE cos >= 0.35
        |ORDER BY query_id, neighbor_id""".stripMargin,

    "emb_int8" ->
      """WITH dims AS (
        |  SELECT i, MAX(ABS(CAST(embedding[i] AS DOUBLE))) AS s
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
        |  GROUP BY 1),
        |scal AS (SELECT list(s ORDER BY i) AS sl FROM dims),
        |r AS (
        |  SELECT vec_id, embedding,
        |    list_transform(range(1, len(embedding) + 1), i ->
        |      CASE WHEN sl[i] = 0 THEN 0.0
        |        ELSE GREATEST(-127.0, LEAST(127.0,
        |          ROUND(CAST(embedding[i] AS DOUBLE) / sl[i] * 127))) * sl[i] / 127 END) AS rec
        |  FROM embeddings CROSS JOIN scal)
        |SELECT vec_id,
        |  ROUND(
        |    list_sum(list_transform(range(1, len(embedding) + 1), i -> CAST(embedding[i] AS DOUBLE) * rec[i]))
        |    / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(rec, y -> y * y)))), 4) AS recon_cos,
        |  ROUND(
        |    list_sum(list_transform(range(1, len(embedding) + 1), i ->
        |      (CAST(embedding[i] AS DOUBLE) - rec[i]) * (CAST(embedding[i] AS DOUBLE) - rec[i])))
        |    / len(embedding), 6) AS mse
        |FROM r ORDER BY vec_id""".stripMargin,

    "emb_stats" ->
      """WITH nrm AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(nrm AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*), 4) AS avg_norm,
        |  ROUND(MIN(nrm), 6) AS min_norm,
        |  ROUND(MAX(nrm), 6) AS max_norm,
        |  CAST(SUM(CASE WHEN nrm < 0.000001 THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
        |FROM nrm GROUP BY label ORDER BY label""".stripMargin,

    "ann_mmr" -> {
      def cosSql(ae: String, be: String): String =
        s"""list_sum(list_transform(list_zip($ae, $be), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           |      / (sqrt(list_sum(list_transform($ae, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |        * sqrt(list_sum(list_transform($be, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
      // Equi-joins over the symmetrized pair frame — a correlated
      // MAX-with-OR subquery here sends DuckDB into a per-row replan
      // that runs minutes instead of milliseconds.
      val rounds = (2 to 10).map { t =>
        val p = t - 1
        s"""sel$t AS (
           |  SELECT c.vid, CAST($t AS BIGINT) AS rk,
           |    0.7 * ANY_VALUE(c.simq) - 0.3 * MAX(ps.cs) AS score
           |  FROM pool c
           |  JOIN psim2 ps ON ps.ida = c.vid
           |  JOIN all$p s ON s.vid = ps.idb
           |  WHERE c.vid NOT IN (SELECT vid FROM all$p)
           |  GROUP BY c.vid
           |  ORDER BY score DESC, c.vid LIMIT 1),
           |all$t AS MATERIALIZED (SELECT * FROM all$p UNION ALL SELECT * FROM sel$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH pool AS MATERIALIZED (
         |  SELECT b.vec_id AS vid,
         |    ROUND(${cosSql("q.embedding", "b.embedding")}, 4) AS simq
         |  FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE b.vec_id <> 0
         |  ORDER BY simq DESC, vid LIMIT 100),
         |pe AS (SELECT p.vid, e.embedding FROM pool p JOIN embeddings e ON e.vec_id = p.vid),
         |psim AS MATERIALIZED (
         |  SELECT a.vid AS ida, b.vid AS idb,
         |    ROUND(${cosSql("a.embedding", "b.embedding")}, 4) AS cs
         |  FROM pe a JOIN pe b ON a.vid < b.vid),
         |psim2 AS MATERIALIZED (
         |  SELECT ida, idb, cs FROM psim UNION ALL SELECT idb, ida, cs FROM psim),
         |sel1 AS (
         |  SELECT vid, CAST(1 AS BIGINT) AS rk, 0.7 * simq AS score
         |  FROM pool ORDER BY score DESC, vid LIMIT 1),
         |all1 AS MATERIALIZED (SELECT * FROM sel1),
         |$rounds
         |SELECT rk, vid AS vec_id, ROUND(score, 6) AS score
         |FROM all10 ORDER BY rk""".stripMargin
    },

    "ann_cosine_topk" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    ROUND(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT query_id, neighbor_id, cos, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM pairs) t
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  )
}
