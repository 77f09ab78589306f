package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph analytics: exact triangle enumeration on a known graph,
  * PageRank conservation/symmetry invariants, and the plan-shape
  * guarantee that the self-joins stay equi-planned (a same-lineage
  * slip would silently fall back to a nested loop). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 plus a pendant edge, each K4 node in C(3,2)=3 triangles") {
    // K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant 4-5
    // (in no triangle; 5 must not appear in the output at all).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle total is rotation-invariant (sum of per-node = 3x count)") {
    val e = Graph.coPurchaseEdges(spark, sfDir)
    val perNode = Graph.triangleCounts(e).agg(sum("n_tri")).as[Long].head()
    assert(perNode % 3 == 0, s"per-node triangle participation sum $perNode not divisible by 3")
  }

  test("pagerank: symmetric star — leaves tie exactly, hub dominates, mass conserved") {
    val pairs = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val scale = 1000000000000L
    val r = Graph.pagerank(edges, iters = 5, scale = scale)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("l1") == r("l2") && r("l2") == r("l3"), "symmetric leaves must tie bit-for-bit")
    assert(r("h") > r("l1"), "hub must out-rank leaves")
    // Integer div loses < 1 unit per node per round: 5 rounds x 4
    // nodes x (1 div + damping div) bounds the leak far under 1e3.
    val total = r.values.sum
    assert(math.abs(total - scale) < 1000L, s"rank mass $total drifted from $scale")
  }

  test("pagerankWeighted: heavier edge draws more rank; uniform weights reduce to pagerank") {
    val scale = 1000000000000L
    // star with one heavy spoke: h->l1 w=3, h->l2/l3 w=1 (symmetric)
    val wpairs = Seq(("h", "l1", 3L), ("h", "l2", 1L), ("h", "l3", 1L))
    val wedges = (wpairs ++ wpairs.map(p => (p._2, p._1, p._3))).toDF("src", "dst", "w")
    val r = Graph.pagerankWeighted(wedges, iters = 5, scale = scale)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("l1") > r("l2") && r("l2") == r("l3"),
      s"heavy spoke must out-rank light ones: $r")
    assert(math.abs(r.values.sum - scale) < 1000L, s"rank mass ${r.values.sum} drifted")
    // w ≡ 1 must reproduce the unweighted arithmetic bit-for-bit
    val pairs = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val uw = Graph.pagerank(edges, 5, scale).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val w1 = Graph.pagerankWeighted(edges.withColumn("w", lit(1L)), 5, scale)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(uw == w1, s"uniform-weight run diverged: $uw vs $w1")
  }

  test("kcoreBounded: K5 survives 3-core peeling, attached path peels away") {
    // K5 on {1..5} (degree 4 each) + path 5-6-7: 6 and 7 have degree
    // < 3 and must peel, dropping 5's degree to 4 (edge 5-6 gone).
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (k5 ++ Seq((5L, 6L), (6L, 7L))).toDF("u", "v")
    val got = Graph.kcoreBounded(edges, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(_ -> 4L).toMap)
  }

  test("kcoreBounded: the shipped 8 rounds reach the fixpoint at k=60 (round 9 changes nothing)") {
    val e = Graph.coPurchaseEdges(spark, sfDir)
    val r8 = Graph.kcoreBounded(e, 60, 8)
    val r9 = Graph.kcoreBounded(e, 60, 9)
    assert(r8.count() > 0, "60-core empty at sf0.001 — k no longer under the collapse threshold")
    assert(r8.exceptAll(r9).isEmpty && r9.exceptAll(r8).isEmpty,
      "peel not converged after 8 rounds at k=60")
  }

  test("DOULION estimate lands within 10% of the exact triangle count (measured ~0.3%)") {
    val e = Graph.coPurchaseEdges(spark, sfDir)
    val exact = Graph.triangleCounts(e).agg(sum("n_tri")).as[Long].head() / 3
    val keep = conv(substring(md5(concat_ws("_", col("u"), col("v"))), 1, 4), 16, 10)
      .cast("long") % 4 === 0
    val est = Graph.triangleCounts(e.filter(keep))
      .agg(sum("n_tri")).as[Long].head() / 3 * 64
    assert(exact > 0 && math.abs(est - exact).toDouble / exact <= 0.10,
      s"DOULION estimate $est vs exact $exact")
  }

  test("triangleCounts beyond-gate fallback: identical counts, no BroadcastExchange") {
    // Force the gate to 0 so the partitioned closing join — the plan a
    // 100x graph would actually run — is what executes, and prove it
    // bit-identical to the broadcast path on the real co-purchase graph.
    val e = Graph.coPurchaseEdges(spark, sfDir)
    val viaBroadcast = Graph.triangleCounts(e)
    val viaFallback = Graph.triangleCounts(e, maxBroadcastEdges = 0L)
    assert(viaBroadcast.exceptAll(viaFallback).isEmpty
      && viaFallback.exceptAll(viaBroadcast).isEmpty,
      "fallback closing join disagrees with the broadcast path")
    // Plan-shape check under the over-gate condition an actual 100x
    // graph would hit: statistics too large for ANY auto-broadcast
    // (modeled by threshold -1 — the one-scan edge build now carries
    // honest small stats at test scale, which would otherwise let
    // Spark legitimately broadcast the tiny wedge-join build side).
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thresholdKey)
    val plan = try {
      spark.conf.set(thresholdKey, "-1")
      Graph.triangleCounts(e, maxBroadcastEdges = 0L)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set(thresholdKey, old)
    assert(!plan.contains("BroadcastExchange"),
      s"over-gate plan still broadcasts the closing edge set:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fallback join degenerated:\n$plan")
  }

  test("harmonicCentrality: path graph P3, exact x12 integers") {
    // 1-2-3: H(1) = 1/1 + 1/2 -> 18, H(2) = 1 + 1 -> 24, H(3) = 18.
    val got = Graph.harmonicCentrality(
        Seq((1L, 2L), (2L, 3L)).toDF("u", "v"), maxHops = 4, scale = 12L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (2L, 18L), 2L -> (2L, 24L), 3L -> (2L, 18L)))
  }

  test("harmonicCentrality: hop truncation — a node 5 away contributes nothing at 4 hops") {
    // P6 chain 1..6: from node 1, node 6 is 5 hops out and must be
    // invisible; n_reached(1) = 4 and H(1) = 12 + 6 + 4 + 3 = 25.
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("u", "v")
    val got = Graph.harmonicCentrality(chain, maxHops = 4, scale = 12L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (4L, 25L), s"node 1 saw ${got(1L)}")
    assert(got(3L) == (5L, 12L + 12L + 6L + 6L + 4L), s"node 3 saw ${got(3L)}")
  }

  test("closenessCentrality: Lin's index exact on P3; square rewards reach") {
    // 1-2-3: node 2 reaches {1,3} at d=1 each -> L = 2²·1e6/2 = 2e6;
    // nodes 1,3 reach 2 at 1 and the far end at 2 -> L = 4e6 // 3.
    val got = Graph.closenessCentrality(
        Seq((1L, 2L), (2L, 3L)).toDF("u", "v"), maxHops = 4, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 3L, 1333333L)),
      2L -> ((2L, 2L, 2000000L)),
      3L -> ((2L, 3L, 1333333L))))
  }

  test("closenessCentrality: truncation matches harmonic's reach on a P6 chain") {
    // Same 4-hop horizon as harmonic: n_reached must agree pairwise,
    // and node 1 (Σd = 1+2+3+4 = 10 over 4 nodes) gets 16e6 // 10.
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("u", "v")
    val cl = Graph.closenessCentrality(chain, maxHops = 4, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val hm = Graph.harmonicCentrality(chain, maxHops = 4, scale = 12L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.keySet == hm.keySet && cl.forall { case (n, (r, _, _)) => hm(n) == r },
      "closeness and harmonic disagree on bounded reach")
    assert(cl(1L) == ((4L, 10L, 1600000L)), s"node 1 saw ${cl(1L)}")
  }

  test("egoBetweenness: star center carries all pairs; square splits geodesics; triangle is zero") {
    // K1,3 (center 0): three non-adjacent leaf pairs, each with the
    // single common neighbor 0 -> eb(0) = 3·scale, leaves have no
    // wedges at all.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val s = Graph.egoBetweenness(star, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s == Map(0L -> ((3L, 3000000L))))
    // C4 (square): each center's one neighbor pair has TWO common
    // neighbors (both geodesics) -> each gets scale div 2
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val q = Graph.egoBetweenness(square, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q == Map(1L -> 500000L, 2L -> 500000L, 3L -> 500000L, 4L -> 500000L))
    // K3: every neighbor pair is adjacent -> no open wedges anywhere
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    assert(Graph.egoBetweenness(tri, scale = 1000000L).count() == 0L)
  }

  test("hits: hand-worked bipartite 2-round integers; hub/auth order") {
    // c1→s1, c2→{s1,s2}, scale 1200: round 1 a=(800,400) h=(480,720);
    // round 2 a_raw=(1200,720) tot 1920 → a=(750,450), h_raw=(750,1200)
    // tot 1950 → h=(461,738) under floor division.
    val e = Seq(("c1", "s1"), ("c2", "s1"), ("c2", "s2")).toDF("src", "dst")
    val got = Graph.hits(e, iters = 2, scale = 1200L)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(1)).toMap
    assert(got == Map(
      ("c1", "hub") -> 461L, ("c2", "hub") -> 738L,
      ("s1", "auth") -> 750L, ("s2", "auth") -> 450L))
    // the two-edge customer out-hubs the one-edge one; the shared
    // supplier out-ranks the exclusive one
    assert(got(("c2", "hub")) > got(("c1", "hub")))
    assert(got(("s1", "auth")) > got(("s2", "auth")))
  }

  test("labelPropagation: two triangles + bridge — hand-run 4 synchronous min-tie rounds") {
    // K3 {1,2,3} + K3 {4,5,6} + bridge 3-4. Synchronous min-tie LPA,
    // hand-unrolled: r1 = {1->2, 2->1, 3->1, 4->3, 5->4, 6->4};
    // r2 = {1->1, 2->1, 3->1, 4->4, 5->3, 6->3};
    // r3 = {1->1, 2->1, 3->1, 4->3, 5->3, 6->3}; r4 stable.
    // Communities: each triangle keeps its own label despite the bridge.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("u", "v")
    val got = Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
  }

  test("labelPropagation: a clique converges to its min id; fixed rounds are deterministic") {
    // K4: round 1 sends everyone to a non-min label mix, but by round 4
    // all four agree on label 1 — and two identical runs agree exactly
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val a = Graph.labelPropagation(edges, rounds = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.labelPropagation(edges, rounds = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.map(_._2) == Set(1L), s"K4 must agree on label 1, got $a")
  }

  test("modularity: two triangles + bridge, exact integers per community") {
    // m = 7 edges; communities {1,2,3} and {4,5,6} (the LPA result);
    // each: L_c = 3 intra edges, d_c = 2+2+3 = 7 endpoint degrees.
    // Q_c*1e9 = (1e9*3)//7 - (1e9*7*7)//(4*7*7) = 428571428 - 250000000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("u", "v")
    val labels = Graph.labelPropagation(edges, rounds = 4)
    val got = Graph.modularity(labels, edges, scale = 1000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 3L, 7L, 178571428L), (3L, 3L, 7L, 178571428L)), s"got $got")
  }

  test("graph self-joins stay equi-planned: no nested loop, no cartesian") {
    val tri = Graph.triangleCounts(Graph.coPurchaseEdges(spark, sfDir))
    val pr = Graph.pagerank(Graph.tradeEdges(spark, sfDir), 2, 1000000000000L)
    for (df <- Seq(tri, pr)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"graph join degenerated:\n$plan")
    }
  }

  test("ktrussBounded: K4 survives 4-truss; a pendant triangle CASCADES out over two rounds") {
    // K4 on {1,2,3,4}: every edge closes 2 triangles — the 4-truss.
    // Triangle {4,5,6} hangs off node 4: each of its edges closes ONE
    // triangle, so the 4-truss peel (support >= 2) removes them — and
    // a 3-truss keeps them (support >= 1).
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("u", "v")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set(Graph.ktrussBounded(edges, k = 4, rounds = 5)) == k4.toSet)
    assert(set(Graph.ktrussBounded(edges, k = 3, rounds = 5)) ==
      k4.toSet ++ Set((4L, 5L), (4L, 6L), (5L, 6L)))
    // genuine cascade: a triangle STRIP (each interior edge in 2
    // triangles) collapses once the boundary peels — the fixed-round
    // result must equal the longer-round result (early-exit contract)
    val strip = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("u", "v")
    val r2 = set(Graph.ktrussBounded(strip, k = 4, rounds = 8))
    assert(r2.isEmpty, s"the strip must fully cascade out at k=4, got $r2")
  }
}
