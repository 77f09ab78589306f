package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCorpus gates short and digit-heavy docs, dedups, and reports per lang") {
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again today"), // survivor
      (2L, "en", "The  quick brown fox jumps over the lazy dog again today"), // dup of 1
      (3L, "en", "too short"),                                               // gated: tokens
      (4L, "de", "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890"),       // gated: digits
      (5L, "de", "der hund und die katze spielen zusammen im garten heute abend") // survivor
    ).toDF("doc_id", "lang", "text")

    val report = Pipeline.corpusReport(Pipeline.cleanCorpus(docs, 10, 0.3))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(report("en") == ((1L, 1L, 11L))) // one survivor, one dup, 11 tokens
    assert(report("de") == ((1L, 0L, 11L))) // digit doc gated before dedup
    assert(report.size == 2)
  }

  test("sourceQuota caps per source deterministically via the k-heap rewrite") {
    val docs = (1L to 10L).map(i => (i, "a", s"alpha doc $i words here")) ++
      (11L to 13L).map(i => (i, "b", s"beta doc $i words here"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = Pipeline.sourceQuota(df, 4).collect()
    val kept = out.filter(_.getAs[Boolean]("kept")).map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    assert(kept.count(_._1 == "a") == 4) // capped
    assert(kept.count(_._1 == "b") == 3) // under cap: all kept
    // deterministic: same input → same keep set
    val kept2 = Pipeline.sourceQuota(df, 4).collect()
      .filter(_.getAs[Boolean]("kept")).map(r =>
        (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(kept.toSet == kept2)
    // the rank filter must prune to top-k BEFORE the shuffle — either
    // graft's TopKPerKeyExec heap or Spark's own WindowGroupLimit
    // (partial group-limit below the exchange); a bare Window over the
    // full corpus would be a per-source sort at scale
    val exec = Pipeline.sourceQuota(df, 4).queryExecution.executedPlan.toString
    assert(exec.contains("TopKPerKey") || exec.contains("WindowGroupLimit"),
      "expected a top-k-pruned window plan")
  }

  test("datasetCard: counts, dup rate, and decimal-exact means in one pass") {
    val docs = Seq(
      (1L, "en", "web", "alpha beta gamma delta"),
      (2L, "en", "web", "Alpha  beta GAMMA delta"), // normalized dup of 1
      (3L, "de", "books", "eins zwei drei")
    ).toDF("doc_id", "lang", "source", "text")
    val card = Pipeline.datasetCard(docs).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(card("n_docs") == 3.0)
    assert(card("n_tokens") == 11.0)
    assert(card("n_langs") == 2.0 && card("n_sources") == 2.0)
    assert(card("dup_rate") == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(card("mean_doc_tokens") == math.rint(11.0 / 3.0 * 1e6) / 1e6)
  }

  test("mixturePlan: small sources saturate, shortfall water-fills the rest") {
    def doc(id: Long, src: String, n: Int) = (id, src, ("tok " * n).trim)
    // A: 100 tokens, B: 1000, C: 1000; uniform thirds, budget 1500 ⇒
    // A saturates at 100, the remaining 1400 splits 700/700 (floor'd
    // through the same double math the operator uses)
    val docs = (Seq(doc(1L, "A", 100)) ++
      (1 to 10).map(i => doc(10L + i, "B", 100)) ++
      (1 to 5).map(i => doc(30L + i, "C", 200))).toDF("doc_id", "source", "text")
    val out = Pipeline.mixturePlan(docs, Map("A" -> 1.0, "B" -> 1.0, "C" -> 1.0), 1500L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("alloc"), r.getAs[Boolean]("saturated"))).toMap
    // r* ≈ 2100, through the operator's exact double path:
    // (budget − cumA)/(1 − cumW) then ·w then floor
    val expectBC =
      math.floor((1500.0 - 100.0) / (1.0 - 1.0 / 3.0) * (1.0 / 3.0)).toLong
    assert(out("A") == ((100L, true)))
    assert(out("B") == ((expectBC, false)))
    assert(out("C") == ((expectBC, false)))
    // under-budget corpus: everything saturates, no solve needed
    val all = Pipeline.mixturePlan(docs, Map("A" -> 1.0, "B" -> 1.0, "C" -> 1.0), 10000L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Boolean]("saturated")).toMap
    assert(all.values.forall(identity))
  }

  test("curriculum: fixed-threshold stages, known docs land in known bands") {
    val df = Seq(
      (1L, "9999 8888 7777"),                           // digit-heavy → q≈0, stage 0
      (2L, ("word " * 120).trim)                        // long clean text → q=1.0, stage 4
    ).toDF("doc_id", "text")
    val out = Pipeline.curriculum(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("stage"), r.getAs[Double]("q"))).toMap
    assert(out(2L)._1 == 4L && out(2L)._2 == 1.0)
    assert(out(1L)._1 == 0L)
    assert(out(1L)._2 < 0.2)
  }

  test("interleaveByWeight: prefixes hold strata in weight ratio, integer phases") {
    val docs = ((1L to 30L).map(i => (i, "en")) ++ (101L to 110L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val ordered = Pipeline.interleaveByWeight(docs, "lang", Map("en" -> 3))
      .orderBy("phase", "lang", "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(3)))
    // every 4-doc prefix window carries 3 en : 1 de while de lasts
    val first12 = ordered.take(12).map(_._1)
    assert(first12.count(_ == "en") == 9 && first12.count(_ == "de") == 3)
    // within a stratum the order is doc_id order
    val enIds = ordered.filter(_._1 == "en").map(_._2).toSeq
    assert(enIds == enIds.sorted)
  }

  test("decontaminate flags benchmark leaks and only benchmark leaks") {
    val bench = Seq(
      (100L, "what is the capital of france paris is the capital of france")
    ).toDF("doc_id", "text")
    val train = Seq(
      // verbatim leak of the benchmark question
      (1L, "quiz answers what is the capital of france paris is the capital of france end"),
      // shares a short phrase only — below minOverlap
      (2L, "the capital of norway is oslo which is a coastal city"),
      // nothing in common
      (3L, "spark plans are optimized by catalyst before execution begins")
    ).toDF("doc_id", "text")
    val flagged = Pipeline.decontaminate(train, bench, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flagged.keySet == Set(1L))
    assert(flagged(1L) >= 5L)
  }

  test("incrementalClean over SnapshotStore CDC equals a full reclean") {
    import java.nio.file.Files
    import graft.operators.SnapshotStore
    val base = Files.createTempDirectory("graft_pipe_cdc").toString
    val store = new SnapshotStore(spark, base, "doc_id")

    def doc(i: Long, lang: String, body: String) = (i, lang, body)
    val v1 = Seq(
      doc(1L, "en", "the quick brown fox jumps over the lazy dog again today"),
      doc(2L, "en", "The  quick brown fox jumps over the lazy dog again today"), // dup of 1
      doc(3L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      doc(4L, "de", "der hund und die katze spielen zusammen im garten heute abend"),
      doc(5L, "de", "ein zwei drei vier fuenf sechs sieben acht neun zehn elf"),
      doc(6L, "en", "to be deleted tomorrow but long enough to pass the gate fine")
    ).toDF("doc_id", "lang", "text")
    // day 2: doc 6 deleted, doc 3 updated to become a dup of 1's group,
    // doc 1 (a group SURVIVOR) updated away from its group (2 takes over),
    // new docs 7 (fresh) and 8 (dup of 4)
    val v2 = Seq(
      doc(1L, "en", "now completely different content that still passes the quality gate"),
      doc(2L, "en", "The  quick brown fox jumps over the lazy dog again today"),
      doc(3L, "en", "the quick brown fox jumps over the lazy dog again today"),
      doc(4L, "de", "der hund und die katze spielen zusammen im garten heute abend"),
      doc(5L, "de", "ein zwei drei vier fuenf sechs sieben acht neun zehn elf"),
      doc(7L, "en", "brand new arrival with plenty of tokens to pass the gate"),
      doc(8L, "de", "der hund und die  katze spielen zusammen im garten heute abend")
    ).toDF("doc_id", "lang", "text")
    store.write(v1, 1L)
    store.write(v2, 2L)

    val prior = Pipeline.cleanCorpus(store.read(1L), 5, 0.3)
    val changes = store.diff(1L, 2L)
    val incr = Pipeline.incrementalClean(prior, changes, 5, 0.3)
    val full = Pipeline.cleanCorpus(store.read(2L), 5, 0.3)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_tokens", "text_hash", "keep")
        .collect().map(_.toSeq).toSet
    assert(canon(incr) == canon(full))
    // survivor handoff actually happened: 2 now keeps its group, 3 is its dup
    val keepMap = incr.select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keepMap(2L) && !keepMap(3L) && keepMap(1L) && keepMap(7L) && !keepMap(8L))
    assert(!keepMap.contains(6L))
  }

  test("sampleStratified is deterministic, stratum-scoped, and append-stable") {
    val docs = (1L to 400L).map { i =>
      (i, if (i % 2 == 0) "en" else "de", s"document number $i with enough tokens")
    }.toDF("doc_id", "lang", "text")
    val once = Pipeline.sampleStratified(docs, "lang", Map("en" -> 3000))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val twice = Pipeline.sampleStratified(docs, "lang", Map("en" -> 3000))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == twice) // hash sampling, not rand(): reproducible
    // only 'en' is thinned; every 'de' doc survives
    assert((1L to 400L).filter(_ % 2 == 1).forall(once.contains))
    val enKept = once.count(_ % 2 == 0)
    assert(enKept > 20 && enKept < 120) // ~30% of 200, loose bounds
    // appending docs never flips existing membership
    val more = (401L to 500L).map(i => (i, "en", s"later arrival $i")).toDF("doc_id", "lang", "text")
    val appended = Pipeline.sampleStratified(docs.unionByName(more), "lang", Map("en" -> 3000))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(appended.filter(_ <= 400L) == once)
  }

  test("tokenBudget keeps the greedy best-first prefix per stratum") {
    // n_tokens: 10,20,30,40 per lang — budget 60 keeps the 40+20? No:
    // greedy by tokens DESC keeps 40 (cum 40), then 30 (cum 70 > 60
    // → dropped), then 20 (cum 90 > 60 → dropped)... running sum is a
    // PREFIX, so exactly [40] for budget 60 and [40,30] for 70.
    val cleaned = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "en", 40L),
      (5L, "de", 50L)
    ).toDF("doc_id", "lang", "n_tokens")
    def kept(budget: Long) =
      Pipeline.tokenBudget(cleaned, "lang", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept(60L) == Set(4L, 5L))
    assert(kept(70L) == Set(4L, 3L, 5L))
    assert(kept(40L) == Set(4L)) // de's 50 over budget: nothing kept
  }

  test("survivor is the lowest doc_id of each content group") {
    val docs = Seq(
      (9L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (7L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "lang", "text")
    val kept = Pipeline.cleanCorpus(docs, 5, 1.0)
      .filter($"keep").select("doc_id").collect().map(_.getLong(0)).toList
    assert(kept == List(3L))
  }

  test("sampleWeighted: zero drops all, one keeps all, membership grows monotonically with weight") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    assert(Pipeline.sampleWeighted(docs, lit(0.0)).count() == 0L)
    assert(Pipeline.sampleWeighted(docs, lit(1.0)).count() == 500L)
    // clamping: out-of-range weights behave as the nearest bound
    assert(Pipeline.sampleWeighted(docs, lit(7.0)).count() == 500L)
    assert(Pipeline.sampleWeighted(docs, lit(-3.0)).count() == 0L)
    def ids(w: Double) = Pipeline.sampleWeighted(docs, lit(w))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (lo, hi) = (ids(0.3), ids(0.8))
    // raising the weight only ADDS members (the md5 bucket is fixed per doc)
    assert(lo.subsetOf(hi), s"w=0.3 kept ${lo.size}, not a subset of w=0.8's ${hi.size}")
    assert(lo.size > 50 && lo.size < 250, s"~30% expected, got ${lo.size}/500")
    assert(hi.size > 300 && hi.size < 480, s"~80% expected, got ${hi.size}/500")
    // unbiasedness: the raw 16-bit bucket compares against w*65536, so
    // the keep rate tracks w tightly (the old %10000 reduction skewed
    // w=0.5 to ~53.4%); 10k docs, binomial 3σ ≈ 1.5%
    val big = (0L until 10000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val frac = Pipeline.sampleWeighted(big, lit(0.5)).count().toDouble / 10000.0
    assert(math.abs(frac - 0.5) < 0.02, s"w=0.5 kept $frac")
  }

  test("assignSplit: disjoint+exhaustive, append-stable, fractions track the basis points") {
    import org.apache.spark.sql.functions.lit
    val docs = (0L until 4000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val split = Pipeline.assignSplit(docs, valBp = 6554, testBp = 6554) // ~10%/10%
    val byDoc = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.size == 4000) // exhaustive, exactly one split per doc
    val counts = byDoc.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("val") - 400) < 100, s"val ${counts("val")}")
    assert(math.abs(counts("test") - 400) < 100, s"test ${counts("test")}")
    assert(counts("train") > 3000)
    // append-stability: the first half's assignments are unchanged by
    // the rest of the corpus (membership is per-doc, not per-dataset)
    val half = Pipeline.assignSplit(docs.filter($"doc_id" < 2000L), 6554, 6554)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => byDoc(id) == s })
    // degenerate bounds hold
    assert(Pipeline.assignSplit(docs, 0, 0).select("split").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("train"))
    val e = intercept[IllegalArgumentException] {
      Pipeline.assignSplit(docs, 40000, 40000)
    }
    assert(e.getMessage.contains("65536"))
  }

  test("assignFolds: exhaustive, roughly uniform, append-stable, k-bounds enforced") {
    val docs = (0L until 5000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val byDoc = Pipeline.assignFolds(docs, 5).select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.size == 5000 && byDoc.values.forall(f => f >= 0 && f < 5))
    val counts = byDoc.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 5 && counts.values.forall(c => math.abs(c - 1000) < 150),
      s"folds ${counts.toMap}")
    // append-stable: a doc's fold never depends on the rest of the corpus
    val half = Pipeline.assignFolds(docs.filter($"doc_id" < 2500L), 5)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(half.forall { case (id, f) => byDoc(id) == f })
    assert(intercept[IllegalArgumentException] {
      Pipeline.assignFolds(docs, 1)
    }.getMessage.contains("folds"))
  }

  test("oversampleBalanced: majority untouched, minority lifted to target in expectation, integer-exact") {
    // majority 'en' 40 docs, minority 'de' 10 → de copies ∈ {4,5}, Σ≈40
    val docs = ((0L until 40L).map(i => (i, "en")) ++ (100L until 110L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = Pipeline.oversampleBalanced(docs, "lang").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("copy")))
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert((0L until 40L).forall(perDoc(_) == 1)) // majority: exactly one copy
    assert((100L until 110L).forall(id => perDoc(id) == 4 || perDoc(id) == 4 + 0 || perDoc(id) == 5))
    val deTotal = out.count(_._2 == "de")
    assert(math.abs(deTotal - 40) <= 10, s"de total $deTotal") // t=40 in expectation
    // copy indices are dense 1..n per doc
    assert(out.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.sameElements(1L to rs.length) })
    // append-stable: removing the other class never changes a doc's copies
    val only = Pipeline.oversampleBalanced(docs.filter($"lang" === "de"), "lang").collect()
    assert(only.length == 10) // alone, de IS the majority → one copy each
  }

  test("sourceMix reports per-cell token counts and corpus shares") {
    val docs = Seq(
      (1L, "a b", "en", "s1"),
      (2L, "c", "en", "s1"),
      (3L, "d e f", "fr", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Pipeline.sourceMix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(("s1", "en")) == ((2L, 3L, 0.666667, 0.5)))
    assert(out(("s2", "fr")) == ((1L, 3L, 0.333333, 0.5)))
  }

  test("clusterBalancedSample: heavy clusters cap at quota, light ones keep everything; deterministic") {
    // a synthetic embedding space with three OBVIOUS clusters: axis
    // directions in 4-d; cluster A is 20x heavier than B/C — the
    // balanced sample must cap it
    def vec(axis: Int, i: Long): Array[Float] = {
      val v = new Array[Float](4)
      v(axis) = 10f + (i % 3)         // dominant direction
      v((axis + 1) % 4) = (i % 5) * 0.01f // tiny within-cluster jitter
      v
    }
    val rows = (1L to 60L).map(i => (i, vec(0, i))) ++        // heavy A
      (61L to 66L).map(i => (i, vec(1, i))) ++                 // light B
      (67L to 70L).map(i => (i, vec(2, i)))                    // light C
    val emb = rows.toDF("vec_id", "embedding")
    val sample = Pipeline.clusterBalancedSample(emb, k = 3, quota = 5,
      kmeansIters = 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perCell = sample.groupBy(_._2).view.mapValues(_.length).toMap
    // every cluster contributes, none above quota, the heavy one capped
    assert(perCell.size == 3, s"clusters: $perCell")
    assert(perCell.values.forall(_ <= 5), perCell.toString)
    assert(perCell.values.max == 5 && perCell.values.sum < 70, perCell.toString)
    // light clusters keep ALL members (size < quota)
    assert(perCell.values.count(_ < 5) >= 1, perCell.toString)
    // deterministic: same inputs, same sample
    val again = Pipeline.clusterBalancedSample(emb, k = 3, quota = 5,
      kmeansIters = 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == sample.toSet)
    // the cap half alone respects a prebuilt assignment exactly
    val assigned = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)).toDF("vec_id", "cell")
    val capped = Pipeline.clusterBalancedSampleFrom(assigned, quota = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.size == 3 && capped.count(_._2 == 0L) == 2
      && capped.count(_._2 == 1L) == 1)
  }

  test("semanticDedup: epsilon-twins collapse to one survivor inside their cluster, diverse vectors untouched") {
    // three separated clusters; cluster A holds three exact-direction
    // twin GROUPS (scaled copies, cosine 1.0) plus diverse members;
    // clusters B/C are all distinct. eps-pruning must collapse each
    // twin group to one survivor and keep everything else.
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = new Array[Float](4)
      v(axis) = 10f
      v((axis + 1) % 4) = jitter
      v
    }
    def scaled(v: Array[Float], f: Float): Array[Float] = v.map(_ * f)
    // jitters 0/1.5/3.0 keep the GROUPS outside each other's epsilon
    // ball (cos ≤ ~0.990 across groups) while scaled copies inside a
    // group sit at cosine exactly 1.0
    val aTwins = Seq(             // groups {1,2,3}, {4,5}, {6,7}
      (1L, vec(0, 0.0f)), (2L, scaled(vec(0, 0.0f), 2f)), (3L, scaled(vec(0, 0.0f), 0.5f)),
      (4L, vec(0, 1.5f)), (5L, scaled(vec(0, 1.5f), 3f)),
      (6L, vec(0, 3.0f)), (7L, scaled(vec(0, 3.0f), 1.5f)))
    // 2.5-wide jitter steps keep consecutive diverse members below
    // cos 0.993 (tight steps at large jitter creep above 1 − eps)
    val aDiverse = (8L to 12L).map(i => (i, vec(0, 1.0f + (i - 8L) * 2.5f)))
    val bc = (21L to 26L).map(i => (i, vec(1, (i % 7) * 0.8f))) ++
      (31L to 35L).map(i => (i, vec(2, (i % 5) * 0.9f)))
    val emb = (aTwins ++ aDiverse ++ bc).toDF("vec_id", "embedding")
    val surv = Pipeline.semanticDedup(emb, k = 3, eps = 0.001, kmeansIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = surv.map(_._1).toSet
    // each twin group keeps exactly one member
    for (g <- Seq(Seq(1L, 2L, 3L), Seq(4L, 5L), Seq(6L, 7L)))
      assert(g.count(ids) == 1, s"group $g -> ${g.filter(ids)}")
    // everything genuinely distinct survives
    val diverse = (8L to 12L) ++ (21L to 26L) ++ (31L to 35L)
    assert(diverse.forall(ids.contains), s"lost diverse ids: ${diverse.filterNot(ids.contains)}")
    // every cluster keeps at least one survivor; ids unique
    assert(surv.map(_._2).distinct.length == 3, surv.mkString(","))
    assert(surv.map(_._1).distinct.length == surv.length)
    // deterministic
    val again = Pipeline.semanticDedup(emb, k = 3, eps = 0.001, kmeansIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSet == surv.toSet)
    // prebuilt-assignment variant prunes ONLY within a cell: the same
    // twin pair split across cells is untouched
    val small = Seq((1L, vec(0, 0f)), (2L, scaled(vec(0, 0f), 2f))).toDF("vec_id", "embedding")
    val splitAssign = Seq((1L, 0L), (2L, 1L)).toDF("vec_id", "cell")
    assert(Pipeline.semanticDedupFrom(small, splitAssign, eps = 0.001).count() == 2L)
    val sameAssign = Seq((1L, 0L), (2L, 0L)).toDF("vec_id", "cell")
    assert(Pipeline.semanticDedupFrom(small, sameAssign, eps = 0.001).count() == 1L)
  }
}
