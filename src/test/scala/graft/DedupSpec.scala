package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  quick brown fox jumps over the lazy dog"), // exact dup after normalization
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (4L, "completely different text about spark engines here")
  ).toDF("doc_id", "text")

  test("exactGroups collapses whitespace/case variants") {
    val groups = Dedup.exactGroups(docs).collect()
    val dupGroup = groups.find(_.getLong(1) == 2L).get
    assert(dupGroup.getLong(2) == 1L) // keep_id = min doc_id
    assert(groups.length == 3)
  }

  test("ngramJaccardPairs finds near-dups above threshold, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs catches a quoted excerpt whose Jaccard is below threshold") {
    // doc 6 = doc 5's opening fully quoted inside a much longer page:
    // containment(6→5-part) = 1.0 but jaccard is diluted by the long tail
    val quote = Seq(
      (5L, "alpha beta gamma delta epsilon"),
      (6L, "alpha beta gamma delta epsilon " +
        "and then a very long unrelated continuation stretching the union " +
        "with many extra tokens that share nothing with the short source text"),
      (7L, "totally unrelated words nowhere near the others at all")
    ).toDF("doc_id", "text")
    val contained = Dedup.containmentPairs(quote, 3, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toList
    assert(contained.map(t => (t._1, t._2)) == List((5L, 6L)))
    assert(contained.head._3 == 1.0) // every shingle of 5 appears in 6
    // the same pair stays BELOW the symmetric Jaccard threshold
    val jacc = Dedup.ngramJaccardPairs(quote, 3, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jacc.contains((5L, 6L)))
  }

  test("shared pair-overlap stats: one materialization feeds every measure, results identical") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The  quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "alpha beta gamma delta epsilon"),
      (5L, "alpha beta gamma delta epsilon plus a long unrelated tail " +
        "of many extra tokens diluting the union far below half"),
      (6L, "completely different text about spark engines here")
    ).toDF("doc_id", "text")

    // memo: same (corpus, params) → the SAME materialized frame (the
    // candidate self-join ran once); different params → a fresh pass
    val s1 = Dedup.pairOverlapStatsShared(corpus, "dedup_spec_corpus", 3)
    val s2 = Dedup.pairOverlapStatsShared(corpus, "dedup_spec_corpus", 3)
    assert(s1 eq s2)
    assert(!(Dedup.pairOverlapStatsShared(corpus, "dedup_spec_corpus", 2) eq s1))

    // both threshold filters over the shared stats equal the
    // self-contained operators row for row
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(canon(Dedup.jaccardFromStats(s1, 1, 2)) ==
      canon(Dedup.ngramJaccardPairs(corpus, 3, 1, 2)))
    assert(canon(Dedup.containmentFromStats(s1, 2, 3)) ==
      canon(Dedup.containmentPairs(corpus, 3, 2, 3)))
  }

  test("hammingNearDup with bands > maxDist equals the brute-force pair set") {
    val rnd = new scala.util.Random(7)
    val base = rnd.nextLong()
    // a cluster within distance 3 of `base`, plus far-away hashes
    val hs = Seq(
      1L -> base,
      2L -> (base ^ 1L),                      // dist 1
      3L -> (base ^ (1L << 20) ^ (1L << 50)), // dist 2
      4L -> (base ^ 0x0F0FL),                 // dist 8: out
      5L -> rnd.nextLong(),
      6L -> rnd.nextLong())
    val df = hs.toDF("doc_id", "h")
    val banded = Dedup.hammingNearDup(df, "doc_id", "h", maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(banded == brute)
    assert(banded.contains((1L, 2L, 1L)) && banded.contains((1L, 3L, 2L)))
    assert(!banded.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("codegen minhash signature is bit-exact with the explode→groupBy shuffle path") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1).toList
    // includes a doc with < k tokens, dropped by both paths
    val withShort = docs.union(Seq((9L, "two words")).toDF("doc_id", "text"))
    assert(canon(Dedup.minhashSignatures(withShort, 3, 32)) ==
      canon(Dedup.minhashSignaturesShuffle(withShort, 3, 32)))
  }

  test("minhash signatures have requested length; identical docs get identical signatures") {
    val sigs = Dedup.minhashSignatures(docs, 3, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sigs.values.forall(_.length == 16))
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("minhash jaccard estimate tracks the exact jaccard on candidates") {
    val sigs = Dedup.minhashSignatures(docs, 3, 64)
    val cands = Dedup.lshCandidates(Dedup.lshBuckets(sigs, 16, 64))
    val est = Dedup.minhashJaccardEstimate(sigs, cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0, 1) // threshold 0: all pairs
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(est((1L, 2L)) == 1.0) // identical docs: every position matches
    // near-dup estimate within the 64-hash standard error of the truth
    val pair = (1L, 3L)
    assert(est.contains(pair) && math.abs(est(pair) - exact(pair)) <= 0.2,
      s"est=${est.get(pair)} exact=${exact.get(pair)}")
  }

  test("lsh candidates include identical docs and exclude unrelated ones") {
    val sigs = Dedup.minhashSignatures(docs, 3, 16)
    val cands = Dedup.lshCandidates(Dedup.lshBuckets(sigs, 4, 16))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("bucketed shingle index: intersection self-join is exchange-free, results match") {
    import org.apache.spark.sql.functions.col
    Dedup.writeShingleIndex(docs, "graft_shingle_idx", 3, 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the candidate join itself — both sides from the bucketed index
      val shA = spark.table("graft_shingle_idx").select(col("doc_id").as("doc_a"), col("shingle"))
      val shB = spark.table("graft_shingle_idx")
        .select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
      val joined = shA.join(shB,
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free candidate join, got:\n$plan")

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
          .sortBy(t => (t._1, t._2)).toList
      assert(canon(Dedup.ngramJaccardPairsIndexed(spark, "graft_shingle_idx", 1, 2)) ==
        canon(Dedup.ngramJaccardPairs(docs, 3, 1, 2)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_shingle_idx")
    }
  }

  test("embCosPairs kernel is bit-exact with the declarative BNLJ formulation") {
    // deterministic pseudo-random embeddings, incl. a near-duplicate pair
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val emb = ((0 until 40).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f))
    } :+ (40L, base) :+ (41L, base.map(x => x * 1.01f)))
      .toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toList
    val kernel = canon(Dedup.embCosPairs(emb, 0.3))
    val decl = canon(Dedup.embCosPairsDeclarative(emb, 0.3))
    assert(kernel.nonEmpty && kernel == decl)
    assert(kernel.exists(t => t._1 == 40L && t._2 == 41L && t._3 > 0.99))
  }

  test("capShingleDf bounds candidate fan-out on a boilerplate-heavy corpus") {
    // 40 docs all sharing one boilerplate sentence (8 shared shingles
    // appearing in every doc) plus unique content. Uncapped, the
    // boilerplate alone wires all 40×39/2 = 780 pairs into the
    // candidate join; capped at df≤10 the boilerplate shingles drop
    // out of the representation and only genuinely-overlapping docs
    // remain candidates.
    val boiler = "terms of service apply all rights reserved contact us here"
    val many = (0 until 40).map { i =>
      (i.toLong, s"$boiler unique document body number $i topic${i % 20} alpha beta")
    }.toDF("doc_id", "text")
    val sh = Dedup.docShingles(many, 3)
    val capped = Dedup.capShingleDf(sh, 10)
    // every boilerplate shingle (df=40) is gone; per-doc shingles survive
    val dfs = capped.groupBy("shingle").count().collect().map(_.getLong(1))
    assert(dfs.nonEmpty && dfs.forall(_ <= 10))
    // candidate pairs through the capped representation are bounded:
    // far fewer than the all-pairs 780 the boilerplate would generate
    val pairs = Dedup.ngramJaccardPairs(many, 3, 0, 1, maxDf = 10)
    assert(pairs.count() < 100)
    // and the uncapped measure on the same corpus does blow up
    val uncapped = Dedup.ngramJaccardPairs(many, 3, 0, 1, maxDf = Int.MaxValue)
    assert(uncapped.count() == 780)
  }

  test("embCosPairs fails fast past the broadcast-rows cap") {
    val emb = (0 until 8).map(i => (i.toLong, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.embCosPairs(emb, 0.9, maxBroadcastRows = 4)
    }
    assert(e.getMessage.contains("embCosPairsBucketed"))
  }

  test("embCosPairsBucketed: subset of exact pairs, catches near-identical vectors") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val emb = ((0 until 40).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f))
    } :+ (40L, base) :+ (41L, base.map(x => x * 1.01f)))
      .toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toList
    val exact = canon(Dedup.embCosPairs(emb, 0.3))
    val approx = canon(Dedup.embCosPairsBucketed(emb, 0.3, 16, 4))
    // every approx pair is a true pair with the identical cosine value
    assert(approx.toSet.subsetOf(exact.toSet))
    // the near-identical pair collides in at least one band
    assert(approx.exists(t => t._1 == 40L && t._2 == 41L && t._3 > 0.99))
    // the AUTO-sized path keeps the same contracts (subset, identical
    // cosines, near-dup caught) while its band bits track the corpus
    val auto = canon(Dedup.embCosPairsBucketedAuto(emb, 0.3))
    assert(auto.toSet.subsetOf(exact.toSet))
    assert(auto.exists(t => t._1 == 40L && t._2 == 41L && t._3 > 0.99))
  }

  test("autoBandBits: bucket-occupancy sizing, clamped to [4, 15]") {
    // small corpora floor at 4 bits; growth is logarithmic in n
    assert(Dedup.autoBandBits(100L) == 4)
    assert(Dedup.autoBandBits(2000L) == 6)   // 2000/32 = 62.5 -> 6 bits
    assert(Dedup.autoBandBits(20000L) == 10) // 20000/32 = 625 -> 10 bits
    assert(Dedup.autoBandBits(1L << 40) == 15) // packed-long ceiling
    // monotone: more vectors never mean coarser buckets
    val bits = Seq(1L, 1000L, 100000L, 10000000L).map(Dedup.autoBandBits(_))
    assert(bits == bits.sorted)
  }

  test("dupClusters resolves pair chains into min-labeled components") {
    // chain 1-2-3 (transitive: 1 and 3 never pair directly) + island 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val comps = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    // a longer chain still converges (diameter > 2)
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val chainComps = Dedup.dupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainComps.values.toSet == Set(1L) && chainComps.size == 12)
  }

  test("simhash: identical docs equal, near-dups close in hamming distance") {
    val hashes = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hashes(1L), hashes(3L)) < hamming(hashes(1L), hashes(4L)))
  }

  test("editDistancePairs: distinct-first, length-blocked, exact distances") {
    import org.apache.spark.sql.functions.{col, levenshtein}
    val df = Seq("kitten", "kitten", "sitten", "sittin", "mitten",
      "completely-different", "kit").toDF("name")
    val pairs = Dedup.editDistancePairs(df, "name", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // repeated "kitten" collapses (no self-pair); kit↔kitten dist 3 excluded
    assert(pairs == Set(
      ("kitten", "sitten", 1L), ("sitten", "sittin", 1L), ("kitten", "sittin", 2L),
      ("kitten", "mitten", 1L), ("mitten", "sitten", 1L), ("mitten", "sittin", 2L)))
    // parity with the unblocked formulation (length blocking loses nothing)
    val names = df.distinct()
    val naive = names.select(col("name").as("a"))
      .crossJoin(names.select(col("name").as("b")))
      .filter(col("a") < col("b"))
      .filter(levenshtein(col("a"), col("b")) <= 2)
      .count()
    assert(pairs.size.toLong == naive)
  }

  test("keepBestPerCluster keeps the longest member per cluster, singletons keep themselves") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "short"),
      (2L, "the longest text of the cluster wins"),
      (3L, "mid length"),
      (5L, "same size"),
      (6L, "same size"), // tie with 5 → lowest id wins
      (9L, "a singleton document")
    ).toDF("doc_id", "text")
    // clusters by explicit pair edges: {1,2,3} (transitively) and {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.keepBestPerCluster(corpus, pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // comp = smallest member; quality = text length; one keeper per comp
    assert(out(1L) == ((1L, 5L, false)))
    assert(out(2L) == ((1L, 36L, true)))  // longest of {1,2,3}
    assert(out(3L) == ((1L, 10L, false)))
    assert(out(5L) == ((5L, 9L, true)))   // tie broken to lowest id
    assert(out(6L) == ((5L, 9L, false)))
    assert(out(9L) == ((9L, 20L, true)))  // singleton: own comp, kept
    // exactly one keeper per component
    val keepersPerComp = out.values.groupBy(_._1).map { case (c, vs) => c -> vs.count(_._3) }
    assert(keepersPerComp.values.forall(_ == 1), s"keepers per comp: $keepersPerComp")
  }

  test("charWindowSeq samples normalized windows on the stride grid, distinct") {
    // normalized text: "abcdefgh ij" (len 11); k=4, stride=3 → positions
    // 0,3,6 (0-based; 7 = len-k is NOT on the grid) → abcd, defg, gh i
    val w = Dedup.charWindowSeq("Abcdefgh  ij", 4, 3)
    assert(w == Seq("abcd", "defg", "gh i"))
    assert(Dedup.charWindowSeq("abc", 4, 3).isEmpty) // shorter than k
    // a looping doc yields repeated windows exactly once
    assert(Dedup.charWindowSeq("aaaaaaaaaa", 4, 3) == Seq("aaaa"))
  }

  test("substringDupPairs finds a verbatim copied span, not unrelated docs") {
    val span = "this exact sixty-plus character span is copied verbatim into the other document"
    val corpus = Seq(
      (1L, s"opening words $span and then doc one continues its own way"),
      // doc 2 shares the span but at a DIFFERENT offset — stride-grid
      // alignment must not be assumed by the test (k=20, stride=1)
      (2L, s"$span with a completely different continuation afterwards"),
      (3L, "nothing here overlaps with the span in the other documents at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringDupPairs(corpus, 20, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= span.length - 20) // long overlap → many shared windows
  }

  test("substringDupPairsHashed returns the exact path's pair set") {
    val span = "another long verbatim span duplicated across two documents for the hashed parity check"
    val corpus = Seq(
      // "pfx " is 4 chars after normalization, so the copied span sits
      // on the SAME stride-2 grid parity in both docs — required for
      // sampled windows to coincide at stride > 1
      (1L, s"pfx $span suffix one"),
      (2L, s"$span entirely different tail"),
      (3L, s"unrelated filler text with no shared windows anywhere in sight"),
      (4L, s"yet more distinct content that matches nothing else in the corpus")
    ).toDF("doc_id", "text")
    val exact = Dedup.substringDupPairs(corpus, 20, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashed = Dedup.substringDupPairsHashed(corpus, 20, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact == hashed)
    assert(exact.nonEmpty)
  }

  test("substringDupPairs df-cap drops boilerplate windows from the join") {
    // the same 30-char window in ALL docs; maxDf=2 must keep it out of
    // the candidate join entirely → no pairs
    val boiler = "shared boilerplate block here!"
    val corpus = (1L to 4L).map(i => (i, s"$boiler unique tail number $i")).toDF("doc_id", "text")
    val pairs = Dedup.substringDupPairs(corpus, 30, 1, maxDf = 2).collect()
    assert(pairs.isEmpty)
  }
}
