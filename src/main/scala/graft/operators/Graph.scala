package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Graph analytics over relationship graphs derived from the lake —
  * the corpus-curation lens: web-scale training-data pipelines rank
  * hosts by link centrality (Common Crawl publishes host-level
  * PageRank/harmonic-centrality for exactly this) and mine
  * co-occurrence structure for near-dup clusters and topic islands.
  * Here the graphs come from the relational tables (part co-purchase,
  * customer↔supplier trade), but the operators are graph-generic:
  * edges in, per-node measures out.
  *
  * Scale posture:
  *  - Edge derivation is an equi-join on the containing entity
  *    (order key), so per-edge fan-out is bounded by the entity's
  *    cardinality cap (TPC-H orders hold ≤ 7 lines → ≤ 21 pairs);
  *    no all-pairs step exists anywhere.
  *  - PageRank is the standard synchronous power iteration: each
  *    round is ONE shuffle keyed by node id (join ranks to edges,
  *    re-aggregate by destination) — the Pregel/GraphX layout, at
  *    home on 1000 executors. Iteration count is fixed (deterministic
  *    plans, unrolled oracle), and per-round frames are
  *    localCheckpoint'ed so the plan stays iteration-depth-constant.
  *  - Triangle enumeration uses the ordered-edge wedge join (a<b<c),
  *    the MapReduce-era standard (Suri & Vassilvitskii, WWW'11): each
  *    triangle materializes exactly once, and the intermediate is
  *    Σ_b deg⁺(b)·deg⁻(b), linear in edges when degree is bounded —
  *    which the co-purchase construction guarantees.
  *
  * All ranks are EXACT scaled integers: rank(v) carries a 10^12 scale,
  * contributions divide with integer `div`, and the damping factor is
  * the rational 85/100 applied as `(85·Σ) div 100` — bit-identical
  * across engines, so the oracle hash-checks a 5-iteration unrolled
  * recursive CTE instead of trusting floating-point convergence.
  */
object Graph {

  /** Part co-purchase edges: undirected {u < v} part pairs that share
    * at least one order.
    *
    * ONE lineitem scan: per-order sorted-distinct part set (partial
    * aggregation merges map-side), pairs exploded from the set with
    * u < v by sort order, then the global distinct. The former
    * two-scan orderkey self-join read lineitem twice and paid three
    * Exchanges (both join sides + distinct) of pair-sized rows; this
    * shape pays one scan and two (groupBy orderkey, distinct) — the
    * per-order pair fan-out is C(items-per-order, 2)-bounded either
    * way (TPC-H orders are ≤ 7 lines), so the explode never amplifies
    * beyond what the join already produced. */
  private def orderPartPairs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      // pre-partition by the group key: the groupBy reuses this ONE
      // exchange (guide §2.4), but the collect_set aggregation now
      // runs on the full parallelism instead of as a single-core
      // partial over the 1-partition scan (guide §2.5 input skew —
      // the exchange moves 16-byte rows, the object agg is the cost)
      .repartition(col("ok"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      // projection barrier before the generator: explode(f(ps)) would
      // re-evaluate the pair construction per generated element (the
      // Dedup.docShingles lesson)
      .select(col("ok"), expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |            y -> named_struct('u', x, 'v', y))))""".stripMargin).as("prs"))
      .select(col("ok"), explode(col("prs")).as("e"))
      .select(col("ok"), col("e.u").as("u"), col("e.v").as("v"))

  def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    orderPartPairs(s, d).select("u", "v").distinct()

  /** STRONG co-purchase edges: part pairs sharing ≥ `minOrders`
    * DISTINCT orders — the repeat-signal threshold that separates
    * market-basket structure from one-off coincidence. Besides the
    * semantics, the threshold is the SCALE CONTROL for the quadratic
    * neighborhood operators (components, link prediction): strong-
    * graph density is threshold-bounded (3.6k edges at sf0.01, 3.9k
    * at sf0.1 — repeat pairs get RARER as the catalog grows), where
    * the raw graph's Σ deg² neighborhood work grows without bound. */
  def strongCoPurchaseEdges(s: SparkSession, d: String, minOrders: Int): DataFrame =
    // Same one-scan pair stream as [[coPurchaseEdges]]; each pair
    // appears at most once per order (set construction), so the
    // distinct-order count is a plain count(*) — the former self-join
    // needed count_distinct (an extra dedup aggregate) because
    // duplicate (orderkey, partkey) lines multiplied join rows.
    orderPartPairs(s, d)
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .select("u", "v")

  /** Customer↔supplier trade edges, symmetric (both directions), with
    * namespaced string node ids so the two key spaces can't collide.
    * Distinct (cust, supp) pairs first, so the symmetric union is
    * duplicate-free by construction. */
  def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk")),
        col("ok") === col("ok2"))
      .select(col("ck"), col("sk")).distinct()
    val c = concat(lit("c"), col("ck").cast("string"))
    val sp = concat(lit("s"), col("sk").cast("string"))
    pairs.select(c.as("src"), sp.as("dst"))
      .unionAll(pairs.select(sp.as("src"), c.as("dst")))
  }

  /** Exact-integer PageRank, `iters` synchronous rounds at damping
    * 85/100 over `scale`-scaled ranks. Requires every node to have at
    * least one out-edge AND one in-edge (symmetric edge sets satisfy
    * both) — no dangling-mass redistribution is needed, so the update
    * is the pure `r'(v) = base + (85·Σ_{u→v} r(u) div deg(u)) div 100`
    * with `base = (15·(scale div N)) div 100`.
    *
    * One shuffle per round: edges⋈(deg,rank) on src, re-aggregate on
    * dst. Ranks are node-count-sized frames; localCheckpoint per round
    * keeps the logical plan flat (5 rounds would otherwise nest 10
    * joins deep and reoptimize the whole chain each round). */
  def pagerank(edgesIn: DataFrame, iters: Int, scale: Long): DataFrame = {
    // Pre-partition by the join key ONCE: every round's edges⋈ranks
    // join then reuses this layout (the checkpoint pins partitioning),
    // so only the node-sized rank frame moves per round — not the
    // edge list, which is the bigger side by the average degree.
    val edges = edgesIn.repartition(col("src")).materialize()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).materialize()
    val n = deg.count() // one scalar aggregate — the only driver value
    val init = scale / n
    val base = 15L * init / 100L
    // The sender's outdeg rides ON the edge row (joined once, outside
    // the loop), so each round is ONE node-keyed join + one aggregate
    // instead of two joins — the rank frame is the only thing that
    // moves per round.
    val edgesDeg = edges.join(deg, Seq("src")).materialize()
    var ranks = deg.select(col("src").as("node"), lit(init).as("r"))
    for (i <- 1 to iters) {
      ranks = edgesDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * sc) div 100")).as("r"))
      // pin every SECOND round (plus the final frame, which callers may
      // consume more than once): plan depth stays round-bounded (≤ 2
      // nested joins) while half the eager pin jobs disappear —
      // measured 3.00 → 2.38 s warm at sf0.1 vs pin-every-round,
      // exceptAll-identical output
      if (i % 2 == 0 || i == iters) ranks = ranks.materialize()
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** [[tradeEdges]] with INTEGER EDGE WEIGHTS: w = number of distinct
    * orders the (customer, supplier) pair traded on — the natural
    * strength signal. Symmetric union of the weighted pairs, so the
    * weight w(u,v) = w(v,u) and every node keeps in- and out-edges. */
  def tradeEdgesWeighted(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk")),
        col("ok") === col("ok2"))
      .groupBy(col("ck"), col("sk"))
      .agg(count_distinct(col("ok")).as("w"))
    val c = concat(lit("c"), col("ck").cast("string"))
    val sp = concat(lit("s"), col("sk").cast("string"))
    pairs.select(c.as("src"), sp.as("dst"), col("w"))
      .unionAll(pairs.select(sp.as("src"), c.as("dst"), col("w")))
  }

  /** WEIGHTED exact-integer PageRank — [[pagerank]] with each sender's
    * mass split proportionally to integer edge weights instead of
    * evenly: `contribution(u→v) = (r(u)·w) div Σ_out w(u)`. Same one
    * shuffle per round, same checkpoint-flattened plans, same
    * unrolled-CTE oracle discipline; r·w stays far inside 64 bits
    * (r < scale = 10¹², weights are order-multiplicity counts). */
  def pagerankWeighted(edgesIn: DataFrame, iters: Int, scale: Long): DataFrame = {
    val edges = edgesIn.repartition(col("src")).materialize()
    val wsum = edges.groupBy("src").agg(sum(col("w")).as("wsum")).materialize()
    val n = wsum.count()
    val init = scale / n
    val base = 15L * init / 100L
    val edgesW = edges.join(wsum, Seq("src")).materialize()
    var ranks = wsum.select(col("src").as("node"), lit(init).as("r"))
    for (i <- 1 to iters) {
      ranks = edgesW.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("(r * w) div wsum").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * sc) div 100")).as("r"))
      // every-2nd-round pin cadence — see [[pagerank]]
      if (i % 2 == 0 || i == iters) ranks = ranks.materialize()
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** [[tradeEdges]] WITHOUT the symmetric union: the directed
    * customer→supplier pairs — [[hits]]'s input, where direction IS
    * the hub/authority structure. */
  def tradeEdgesDirected(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk")),
        col("ok") === col("ok2"))
      .select(col("ck"), col("sk")).distinct()
    pairs.select(concat(lit("c"), col("ck").cast("string")).as("src"),
      concat(lit("s"), col("sk").cast("string")).as("dst"))
  }

  /** Exact-integer HITS (Kleinberg 1999, the hubs-and-authorities
    * power iteration) over a DIRECTED edge set — run here on the
    * customer→supplier trade graph, whose bipartite shape is the
    * algorithm's native habitat: customers are pure hubs (they point
    * at suppliers), suppliers pure authorities. `iters` synchronous
    * rounds of a(v) = Σ_{u→v} h(u) then h(u) = Σ_{u→v} a(v), each
    * side renormalized to SUM = `scale` in integer arithmetic
    * (`(x·scale) div Σx` — the L¹ normalization every engine can
    * replay exactly, where the classical L² norm's sqrt cannot be
    * integer-exact). Scores stay ≤ scale so h·scale fits 64 bits.
    * Same Pregel posture as [[pagerank]]: edges partitioned once by
    * the join key, one shuffle per half-round, localCheckpoint keeps
    * plan depth round-constant. */
  def hits(edgesIn: DataFrame, iters: Int, scale: Long): DataFrame = {
    val edges = edgesIn.repartition(col("src")).materialize()
    val hubs0 = edges.select(col("src").as("node")).distinct()
    val auth0 = edges.select(col("dst").as("node")).distinct()
    val nh = hubs0.count()
    var hubs = hubs0.select(col("node"), lit(scale / nh).as("h")).materialize()
    var auths = auth0.select(col("node"), lit(0L).as("a")).materialize()
    def renorm(df: DataFrame, c: String): DataFrame = {
      // L1-renormalize in exact integers: Σ after = within |nodes| of
      // `scale` (floor division), order-independent. The total rides a
      // broadcast 1-row cross join instead of an eager .head(), so no
      // extra driver action per half-round; applied LAZILY over the
      // checkpointed raw aggregate, the edge-sized join+agg runs once
      // per half-round (it used to execute twice: once for the total,
      // once for the rows) and consumers pay only a node-sized rescan.
      // guard the 1-row total: integer `div` by a NULL/0 total would
      // silently null every score for the rest of the iteration (the
      // old eager .head() path failed loudly on the same degenerate
      // input) — raise instead, evaluated once on the 1-row frame
      val tot = df.agg(sum(col(c)).as("__t"))
        .select(when(col("__t") > 0, col("__t"))
          .otherwise(raise_error(lit(
            s"hits: degenerate graph — renorm total of '$c' is zero/null")))
          .as("__tot"))
      df.crossJoin(broadcast(tot))
        .select(col("node"), expr(s"($c * $scale) div __tot").as(c))
    }
    for (_ <- 1 to iters) {
      auths = renorm(
        edges.join(hubs, col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("h")).as("a"))
          .select(col("dst").as("node"), col("a")).materialize(), "a")
      hubs = renorm(
        edges.join(auths, col("dst") === col("node"))
          .groupBy(col("src")).agg(sum(col("a")).as("h"))
          .select(col("src").as("node"), col("h")).materialize(), "h")
    }
    hubs.select(col("node"), col("h").as("score"), lit("hub").as("side"))
      .unionAll(auths.select(col("node"), col("a").as("score"), lit("auth").as("side")))
  }

  /** Per-node triangle participation counts over ordered edges
    * {u < v}, via DEGREE-ORDERED ORIENTATION (Chiba & Nishizeki 1985;
    * the standard scale formulation): orient every edge from the
    * (degree, id)-smaller endpoint to the larger, enumerate wedges
    * only at each triangle's unique minimum apex (pairs of
    * out-neighbors), close against the undirected edge set. Wedge
    * count drops from Σ deg⁺·deg⁻ to Σ C(outdeg, 2) with
    * outdeg = O(√m) — this is what keeps triangle counting viable
    * when a hub node would otherwise explode the plain wedge join
    * (sf1 probe: 146 s plain → oriented is the shipped plan). The
    * orientation is a total order, so every triangle materializes
    * exactly once at its apex. Wedges come from per-apex sorted
    * adjacency arrays (one keyed shuffle), not an o1⋈o2 self-join
    * (two keyed shuffles + an |edges|-row hash build per partition).
    * Requires a DISTINCT edge set {u < v} — every caller's edge
    * builders end in distinct()/threshold aggregation. */
  def triangleCounts(edgesIn: DataFrame,
      maxBroadcastEdges: Long = 20000000L,
      degIn: Option[DataFrame] = None): DataFrame = {
    val e = edgesIn.materialize()
    // callers that already hold the degree frame (clustering joins it
    // into its own output) pass it in — one 2|E|-row aggregate saved
    // consumed by both orientation joins, but NOT pinned: the two deg
    // subtrees are plan-identical, so Spark serves the second from a
    // ReusedExchange — a materialize here measured as pure overhead
    // (one extra blocking job per call)
    val deg = degIn.getOrElse(
      e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg")))
    val uLower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), Seq("v"))
      .select(when(uLower, col("u")).otherwise(col("v")).as("src"),
        when(uLower, col("v")).otherwise(col("u")).as("dst"))
      .materialize()
    // Wedge generation stays the o1⋈o2 apex self-join: an
    // adjacency-array alternative (collect_set per apex + pair
    // explode, one exchange instead of two) was MEASURED SLOWER at
    // sf0.1 (graph_triangles 5.8→9.6 s, clustering 8.3→10 s, approx
    // 2.6→4.2 s, same session, 3 passes) — the ObjectHashAggregate +
    // nested-array generator loses more per row than the second
    // |edges| exchange and codegen hash-probe emission cost. Kept the
    // join (guide §1.2: the "ideal" plan lost the empirical check).
    val o1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val o2 = oriented.select(col("src").as("a2"), col("dst").as("c"))
    // The wedge join's sides are BOTH edge-sized — broadcasting one
    // (which accurate post-checkpoint statistics would otherwise let
    // Spark do at small scale) builds an |edges|-row hash relation on
    // the driver per run and can never survive real scale; pin the
    // partitioned hash join deliberately (guide §3.1 — no sort, both
    // sides shuffled by the apex key).
    val wedges = o1.join(o2.hint("shuffle_hash"),
        col("a") === col("a2") && col("b") < col("c"))
      .select(col("a"), col("b"), col("c"))
    // The wedge stream is Σ C(outdeg,2) rows — orders of magnitude
    // bigger than the edge set. SHUFFLING it into the closing join is
    // the whole cost of the operator (sf1 probe: 173 s shuffled vs
    // 64 s broadcast-closed, warm), so when the edge set fits an executor
    // (explicit gate, the maxBroadcastRows posture) the closing side
    // broadcasts and wedges stay pipeline-local: generated and probed
    // in place, never exchanged. Beyond the gate (`maxBroadcastEdges`,
    // the maxBroadcastRows posture), fall back to the partitioned
    // closing join — correctness identical (spec-proven: fallback ≡
    // broadcast, no BroadcastExchange in the fallback plan), and at
    // that scale the wedge shuffle is the honest cost of exact
    // triangle counting; the hint pins shuffle-hash so honest
    // post-materialization stats can never re-introduce a driver-side
    // broadcast of an over-gate edge set (guide §3.1).
    val closing = e.select(col("u").as("b3"), col("v").as("c3"))
    val nEdges = e.count() // metadata scalar off the checkpointed frame
    val closeSide =
      if (nEdges <= maxBroadcastEdges) broadcast(closing)
      else closing.hint("shuffle_hash")
    val tri = wedges
      .join(closeSide, col("b") === col("b3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy("part_id").agg(count(lit(1)).as("n_tri"))
  }

  /** Bounded-hop harmonic centrality (Boldi & Vigna, "Axioms for
    * Centrality" 2014 — the measure Common Crawl publishes next to
    * PageRank for host ranking): H(v) = Σ_{u ≠ v} 1/d(u, v), truncated
    * at `maxHops` (beyond-horizon nodes contribute 0, the standard
    * finite-radius reading). EXACT integers: contributions are
    * `scale/d` with `scale` = LCM(1..maxHops) (12 for 4 hops), so
    * every division is exact and the oracle hash-checks an unrolled
    * BFS instead of trusting float summation order.
    *
    * The BFS runs from ALL sources at once as frontier joins — the
    * pair frame is why this operator takes the THRESHOLD-BOUNDED
    * strong graph (the linkpred posture): reachable-pair count is the
    * irreducible output size, and the threshold is the scale control
    * that keeps it node²-bounded on a small dense core rather than
    * corpus-sized. Per round: previous frontier ⋈ symmetric edges,
    * minus already-seen pairs (anti-join), frames localCheckpoint'ed
    * so plan depth stays hop-constant. */
  def harmonicCentrality(edgesIn: DataFrame, maxHops: Int, scale: Long): DataFrame =
    boundedBfsPairs(edgesIn, maxHops)
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_reached"),
        // `div` keeps the arithmetic in 64-bit integers; exact because
        // scale is the LCM of every possible d
        sum(expr(s"$scale div d")).as("harmonic_scaled"))
      .select(col("m").as("part_id"), col("n_reached"), col("harmonic_scaled"))

  /** Bounded-hop closeness via Lin's index (Lin 1976, the
    * disconnected-graph-safe closeness Boldi & Vigna's survey
    * recommends over the classic 1/Σd): L(v) = |reach(v)|² / Σ d(u,v),
    * truncated at `maxHops` like [[harmonicCentrality]] — the square
    * rewards reaching MANY nodes, where raw closeness perversely
    * favors tiny components. Output keeps the exact integer
    * sufficient statistics (n_reached, dist_sum) plus the scaled
    * index `(n² · scale) div Σd` so the oracle replays the identical
    * 64-bit arithmetic. Shares the all-sources BFS pair frame (and
    * its strong-graph scale posture) with harmonic. */
  def closenessCentrality(edgesIn: DataFrame, maxHops: Int, scale: Long): DataFrame =
    boundedBfsPairs(edgesIn, maxHops)
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_reached"), sum(col("d")).as("dist_sum"))
      .select(col("m").as("part_id"), col("n_reached"), col("dist_sum"),
        expr(s"(n_reached * n_reached * $scale) div dist_sum").as("lin_scaled"))

  /** Ego betweenness (Everett & Borgatti, "Ego network betweenness"
    * 2005 — the tractable local stand-in for Freeman betweenness that
    * correlates with it strongly on sparse graphs): for each center v,
    * Σ over NON-ADJACENT neighbor pairs (s,t) of 1/σ_st, where σ_st =
    * the number of common neighbors of s and t (every 2-path s–·–t is
    * a geodesic exactly when s,t aren't adjacent). EXACT integers:
    * contributions are `scale div σ` summed in 64 bits. The wedge
    * stream is the triangle operator's Σ C(deg,2) bound, so this takes
    * the THRESHOLD-BOUNDED strong graph (the linkpred posture); the
    * closing anti-join (drop adjacent pairs) and the σ re-aggregate
    * are keyed shuffles on the wedge endpoints. */
  def egoBetweenness(edgesIn: DataFrame, scale: Long): DataFrame = {
    val e = edgesIn.materialize() // edges normalized u < v
    val nb1 = e.select(col("u").as("c"), col("v").as("s"))
      .unionAll(e.select(col("v").as("c"), col("u").as("s")))
    val nb2 = e.select(col("u").as("c2"), col("v").as("t"))
      .unionAll(e.select(col("v").as("c2"), col("u").as("t")))
    val wedges = nb1.join(nb2, col("c") === col("c2") && col("s") < col("t"))
      .select(col("c"), col("s"), col("t"))
    val ex = e.select(col("u").as("s2"), col("v").as("t2"))
    val open = wedges.join(ex,
        col("s") === col("s2") && col("t") === col("t2"), "left_anti")
      .materialize()
    val sigma = open.groupBy("s", "t").agg(count(lit(1)).as("cn"))
    open.join(sigma, Seq("s", "t"))
      .select(col("c"), expr(s"$scale div cn").as("contrib"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("n_open_wedges"), sum(col("contrib")).as("eb_scaled"))
      .select(col("c").as("part_id"), col("n_open_wedges"), col("eb_scaled"))
  }

  /** The shared all-sources bounded BFS: (n, m, d) pairs with
    * 1 ≤ d = d(n, m) ≤ maxHops. Per round: previous frontier ⋈
    * symmetric edges, minus already-seen pairs (anti-join), frames
    * localCheckpoint'ed so plan depth stays hop-constant. The pair
    * frame is why callers pass the THRESHOLD-BOUNDED strong graph:
    * reachable-pair count is the irreducible output size. */
  private def boundedBfsPairs(edgesIn: DataFrame, maxHops: Int): DataFrame = {
    val e = edgesIn.materialize()
    val sym = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      .materialize()
    val nodes = sym.select(col("x").as("n")).distinct()
    // `known` is the UNION of the per-hop checkpointed frontiers, never
    // re-checkpointed: re-materializing the accumulated pair set every
    // hop copied O(pairs) again per hop (O(hops²) total rewrite) for a
    // frame whose members are each already materialized — the union of
    // checkpointed frames is plan-flat by construction.
    var frontier = nodes.select(col("n"), col("n").as("m"), lit(0).as("d"))
      .materialize()
    var known = frontier
    for (h <- 1 to maxHops) {
      frontier = frontier.join(sym, col("m") === col("x"))
        .select(col("n"), col("y").as("m")).distinct()
        .join(known.select(col("n"), col("m")), Seq("n", "m"), "left_anti")
        .withColumn("d", lit(h))
        .materialize()
      known = known.unionAll(frontier)
    }
    known.filter(col("d") > 0)
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003's
    * strongest simple baseline): for node pairs at distance 2 that are
    * NOT already edges, count shared neighbors — the candidate edges a
    * recommender would propose. Same wedge join as triangles (so the
    * same Σ deg² cost bound); existing edges leave via an anti-join;
    * top-K lands via TakeOrderedAndProject under a total (cn desc,
    * a, c) order so the LIMIT boundary hashes deterministically. */
  def commonNeighborCandidates(edgesIn: DataFrame, k: Int): DataFrame = {
    val e = edgesIn.materialize()
    val nb1 = e.select(col("u").as("b"), col("v").as("a"))
      .unionAll(e.select(col("v").as("b"), col("u").as("a")))
    val nb2 = e.select(col("u").as("b2"), col("v").as("c"))
      .unionAll(e.select(col("v").as("b2"), col("u").as("c")))
    val cand = nb1.join(nb2, col("b") === col("b2") && col("a") < col("c"))
      .groupBy("a", "c").agg(count(lit(1)).as("cn"))
    val ex = e.select(col("u").as("a2"), col("v").as("c2"))
    cand.join(ex, col("a") === col("a2") && col("c") === col("c2"), "left_anti")
      .orderBy(col("cn").desc, col("a"), col("c")).limit(k)
  }

  /** Bounded k-core peeling (Seidman 1983; the MapReduce rounds of
    * Montresor et al. 2013): `rounds` synchronous passes of "drop
    * every node with degree < k, then drop its edges". Output is the
    * surviving subgraph's node degrees after EXACTLY `rounds` passes —
    * deterministic whether or not the peel has converged, so the
    * oracle unrolls the same fixed rounds instead of trusting
    * data-dependent convergence (the spec pins a case that IS the
    * fixpoint). Each round is one degree aggregate + two semi-joins,
    * all keyed shuffles; per-round frames localCheckpoint'ed to keep
    * plan depth constant — the same posture as [[pagerank]]. */
  def kcoreBounded(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edgesIn.materialize()
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("u").as("n")).unionAll(ed.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
    // Peeling only removes: an edge-count-stable round proves every
    // later round a no-op, so exiting early returns EXACTLY the
    // fixed-`rounds` result while paying only the rounds that peel
    // (sf1: fixpoint by round ~3 of 8 — the count off the
    // checkpointed frame is metadata-cheap).
    var before = e.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val keep = degrees(e).filter(col("dg") >= k)
      e = e.join(keep.select(col("n").as("ku")), col("u") === col("ku"), "left_semi")
        .join(keep.select(col("n").as("kv")), col("v") === col("kv"), "left_semi")
        .materialize()
      val after = e.count()
      stable = after == before
      before = after
      r += 1
    }
    degrees(e).select(col("n").as("part_id"), col("dg").as("core_degree"))
  }

  /** k-TRUSS decomposition, bounded rounds (Cohen 2008) — the
    * EDGE-level cohesion ladder next to [[kcoreBounded]]'s node-level
    * one: keep edges supported by ≥ k-2 triangles IN THE CURRENT
    * SUBGRAPH, iterating because each peel can drop survivors' support
    * (the trussiest subgraph a curation pipeline treats as "products
    * that sell together as a CLIQUE, not a hub"). Deterministic and
    * oracle-able: fixed `rounds`, and peeling only removes edges — an
    * edge-count-stable round proves every later round a no-op, so the
    * early exit returns EXACTLY the fixed-round result (the kcore
    * posture). Per round: one triangle listing on the current edge set
    * (two equi-joins over checkpointed, disjoint-named copies — never
    * a same-lineage self-join) and one support aggregate; on the
    * THRESHOLD-BOUNDED strong graph each round is a few-thousand-row
    * frame, so the iteration costs metadata, not scans. */
  def ktrussBounded(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var e = edgesIn.select("u", "v").materialize()
    var before = e.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val ab = e.select(col("u").as("a"), col("v").as("b"))
      val ac = e.select(col("u").as("a2"), col("v").as("c"))
      val bc = e.select(col("u").as("b2"), col("v").as("c2"))
      val tri = ab.join(ac, col("a") === col("a2") && col("b") < col("c"))
        .join(bc, col("b") === col("b2") && col("c") === col("c2"))
        .select(col("a"), col("b"), col("c"))
      val sup = tri.select(col("a").as("u"), col("b").as("v"))
        .unionAll(tri.select(col("a").as("u"), col("c").as("v")))
        .unionAll(tri.select(col("b").as("u"), col("c").as("v")))
        .groupBy("u", "v").agg(count(lit(1)).as("__sup"))
      e = e.join(sup.filter(col("__sup") >= k - 2), Seq("u", "v"), "left_semi")
        .materialize()
      val after = e.count()
      stable = after == before
      before = after
      r += 1
    }
    e
  }

  /** COMMUNITY DETECTION by deterministic synchronous label
    * propagation (Raghavan, Albert & Kumara 2007, made reproducible):
    * labels start as node ids; each of `rounds` SYNCHRONOUS rounds,
    * every node adopts the MOST FREQUENT label among its neighbors,
    * ties broken by MIN label. Classic LPA is randomized (random
    * update order, random tie-breaks) and therefore unverifiable; the
    * fixed-round synchronous min-tie variant is the unrolled-CTE-
    * provable one (the kcore posture: output = EXACTLY the fixed-round
    * state, converged or not). Exact integers end to end — the
    * frequency vote rides a lexicographic MIN over (-count, label).
    *
    * Runs on the THRESHOLD-BOUNDED strong graph (the linkpred
    * posture): one keyed shuffle per round (symmetric edges ⋈ labels
    * on src, re-aggregate on dst), label frames node-sized, per-round
    * localCheckpoint keeps the plan flat. Edges pre-partition by the
    * join key ONCE; only the node-sized label frame moves per round. */
  def labelPropagation(edgesIn: DataFrame, rounds: Int): DataFrame = {
    val sym = edgesIn.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edgesIn.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src")).materialize()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).materialize()
    for (i <- 1 to rounds) {
      labels = sym.join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy("dst")
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("b"))
        .select(col("dst").as("node"), col("b.l").as("lbl"))
      // every-2nd-round pin cadence — see [[pagerank]] (final round
      // pinned: modularity consumes the label frame twice)
      if (i % 2 == 0 || i == rounds) labels = labels.materialize()
    }
    labels.select(col("node").as("part_id"), col("lbl").as("community"))
  }

  /** MODULARITY (Newman & Girvan 2004) of a community assignment over
    * an undirected edge set, EXACT integers: per community c,
    * Q_c·scale = (scale·L_c) div m − (scale·d_c²) div (4m²), where
    * L_c = intra-community edges, d_c = endpoint-degree sum, m = |E| —
    * the per-community decomposition Σ_c Q_c of the classical
    * Q = Σ_c [L_c/m − (d_c/2m)²], integer-divided per community so
    * both engines replay it bit-for-bit. Two keyed aggregates over the
    * label-tagged edge list; the label frame broadcasts (node-sized on
    * the threshold-bounded strong graph). */
  def modularity(labels: DataFrame, edgesIn: DataFrame, scale: Long): DataFrame = {
    val e = edgesIn.materialize()
    val m = e.count()
    val lu = labels.select(col("part_id").as("u"), col("community").as("cu"))
    val lv = labels.select(col("part_id").as("v"), col("community").as("cv"))
    val tagged = e.join(broadcast(lu), Seq("u")).join(broadcast(lv), Seq("v"))
      .materialize()
    val intra = tagged.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("l_c"))
    val degSum = tagged.select(col("cu").as("community"))
      .unionAll(tagged.select(col("cv").as("community")))
      .groupBy("community").agg(count(lit(1)).as("d_c"))
    degSum.join(intra, Seq("community"), "left_outer")
      .na.fill(Map("l_c" -> 0L))
      .select(col("community"), col("l_c"), col("d_c"),
        (expr(s"($scale * l_c) div $m")
          - expr(s"($scale * d_c * d_c) div ${4L * m * m}")).as("q_scaled"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_degree" -> { (s, d) =>
      // Degree histogram of the co-purchase graph — the first question
      // a graph pipeline asks (is the degree bounded? is there a hub
      // that will skew every later shuffle?).
      val e = coPurchaseEdges(s, d)
      e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
        .groupBy("dg").agg(count(lit(1)).as("n_parts"))
        .select(col("dg").as("degree"), col("n_parts"))
        .orderBy("degree")
    },

    "graph_triangles" -> { (s, d) =>
      triangleCounts(coPurchaseEdges(s, d)).orderBy("part_id")
    },

    "graph_pagerank" -> { (s, d) =>
      pagerank(tradeEdges(s, d), iters = 5, scale = 1000000000000L)
        .orderBy("node")
    },

    "graph_ktruss" -> { (s, d) =>
      // Edge-level cohesion on the strong co-purchase graph: the
      // 3-truss (every surviving edge closes ≥1 triangle among
      // survivors) and 4-truss (≥2 — this one genuinely CASCADES:
      // each peel drops neighbors' support, sf0.001 takes 5 rounds to
      // its fixpoint) as one labeled edge list. Strong-graph triangle
      // density FALLS with catalog size (repeat-pair cliques get
      // rarer), so the truss is the sharpened version of that signal
      // — and the threshold keeps every round's frame metadata-sized
      // at any sf. Oracle unrolls the identical peel per round,
      // MATERIALIZED from round one.
      val edges = strongCoPurchaseEdges(s, d, 2).materialize()
      ktrussBounded(edges, k = 3, rounds = 5).withColumn("k", lit(3))
        .unionByName(ktrussBounded(edges, k = 4, rounds = 5).withColumn("k", lit(4)))
        .orderBy("k", "u", "v")
    },

    "graph_communities" -> { (s, d) =>
      // Communities on the strong co-purchase graph: 4 synchronous
      // min-tie LPA rounds (see labelPropagation — the deterministic,
      // oracle-able variant), one shuffle per round. The oracle unrolls
      // the identical vote per round (MATERIALIZED CTEs from round one
      // — the HITS lesson).
      labelPropagation(strongCoPurchaseEdges(s, d, 2), rounds = 4)
        .orderBy("part_id")
    },

    "graph_modularity" -> { (s, d) =>
      // Quality of the LPA communities: exact-integer per-community
      // modularity decomposition over the same strong graph — the
      // "did the communities mean anything" check a pipeline runs
      // right after detection. Oracle replays LPA (shared CTE builder)
      // then the two aggregates in identical div arithmetic.
      val edges = strongCoPurchaseEdges(s, d, 2).materialize()
      modularity(labelPropagation(edges, rounds = 4), edges, scale = 1000000000L)
        .orderBy("community")
    },

    "graph_linkpred" -> { (s, d) =>
      // Candidates from the STRONG graph: common-neighbor counting is
      // inherently Σ C(deg,2) wedges into a pair-keyed aggregate (the
      // top-K can't prune before the counts exist), so the raw graph's
      // version shuffles ~10⁹ wedge rows at sf1 — the threshold-
      // bounded strong graph keeps the same operator exact AND scale-
      // safe, and "recommend from repeat-signal structure" is the
      // semantically defensible input anyway.
      commonNeighborCandidates(strongCoPurchaseEdges(s, d, 2), 50)
    },

    "graph_components" -> { (s, d) =>
      // Connected components of the STRONG co-purchase graph (pairs
      // sharing ≥ 2 distinct orders — the repeat-signal threshold
      // that separates market-basket structure from one-off
      // coincidence; the unthresholded graph is one giant blob).
      // Rides Dedup.dupClusters' pointer-jumped min-label propagation
      // (log-diameter rounds, labels-only state) — the same CC core
      // serving near-dup clustering serves graph analytics, which is
      // the point of having it as a library operator.
      val pairs = strongCoPurchaseEdges(s, d, 2)
        .select(col("u").as("doc_a"), col("v").as("doc_b"))
      Dedup.dupClusters(pairs)
        .select(col("doc_id").as("part_id"), col("comp"))
        .orderBy("part_id")
    },

    "graph_assortativity" -> { (s, d) =>
      // Degree assortativity (Newman, PRL 2002): the Pearson
      // correlation of endpoint degrees over the symmetrized edge
      // list — do hubs link to hubs (r > 0, social-network shape) or
      // to leaves (r < 0, internet/star shape)? Decides whether
      // degree-based partitioning will skew. Sufficient statistics as
      // EXACT DECIMAL(38) sums (the dq_corr contract — M·Σxy hits
      // ~2×10¹⁸ at sf1 and would overflow a long at 100 TB), one
      // closed-form double at the boundary; the whole query is the
      // degree aggregate + one edge-keyed join + a 1-row reduce.
      val e = coPurchaseEdges(s, d).materialize()
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val sym = e.select(col("u").as("x"), col("v").as("y"))
        .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      val dec = DecimalType(38, 0)
      val pairs = sym
        .join(deg.select(col("n").as("x"), col("dg").as("dx")), Seq("x"))
        .join(deg.select(col("n").as("y"), col("dg").as("dy")), Seq("y"))
        .select(col("dx").cast(dec).as("dx"), col("dy").cast(dec).as("dy"))
      pairs.agg(
        count(lit(1)).as("m2"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
        .select(col("m2"),
          round((col("m2") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
            / (sqrt((col("m2") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
              * sqrt((col("m2") * col("syy") - col("sy") * col("sy")).cast(DoubleType))), 6)
            .as("assortativity"))
    },

    "graph_clustering" -> { (s, d) =>
      // Local clustering coefficient (Watts & Strogatz 1998):
      // c(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — how close v's
      // neighborhood is to a clique, the standard "is this a
      // community or a star" diagnostic. Reuses the oriented triangle
      // counts and the degree frame (one equi-join on node id); the
      // only division is the single double at the output boundary.
      // Nodes with deg < 2 have no defined coefficient and carry 0
      // triangles by construction, so the left join + zero-fill keeps
      // them with c = NULL.
      val e = coPurchaseEdges(s, d).materialize()
      // shared with the triangle operator but NOT pinned: identical
      // aggregate subtrees dedup via ReusedExchange, and the honest
      // aggregate size estimate keeps the orientation joins broadcast
      // at test scale — a pinned deg (LogicalRDD) lost its estimate
      // and flipped them to SortMergeJoin (sf1: clustering 77 s vs
      // triangles 49 s, same wedge work)
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      deg.join(triangleCounts(e, degIn = Some(deg))
          .select(col("part_id").as("n"), col("n_tri")),
          Seq("n"), "left")
        .select(col("n").as("part_id"), col("dg").as("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          when(col("dg") >= 2,
            round(coalesce(col("n_tri"), lit(0L)).cast(DoubleType) * 2
              / (col("dg") * (col("dg") - 1)), 6)).as("coeff"))
        .orderBy("part_id")
    },

    "graph_triangles_approx" -> { (s, d) =>
      // DOULION sampled triangle count (Tsourakakis et al., KDD 2009):
      // keep each edge with EXACT probability 1/4 via the portable-md5
      // bucket (%4 divides 2^16 evenly — no residue bias), count
      // triangles on the sample, scale by 1/p³ = 64. Wedge work drops
      // ×16 — the scale path when graph_triangles' exact Σdeg² cost
      // (50 s at sf1) is too dear for a monitoring query. The sample
      // is content-addressed, so the estimate is reproducible across
      // engines and runs and the oracle hash-checks it EXACTLY; the
      // spec pins measured accuracy (≤1.5% observed, 10% bound) vs
      // the exact count.
      val keep = conv(substring(md5(concat_ws("_", col("u"), col("v"))), 1, 4), 16, 10)
        .cast(org.apache.spark.sql.types.LongType) % 4 === 0
      triangleCounts(coPurchaseEdges(s, d).filter(keep))
        .agg(expr("sum(n_tri) div 3").as("tri_sampled"))
        .select(col("tri_sampled"), (col("tri_sampled") * 64).as("est_total"))
    },

    "graph_pagerank_weighted" -> { (s, d) =>
      // Trade-strength PageRank: mass flows proportionally to how
      // many distinct orders a (customer, supplier) pair traded on —
      // the weighted-edge variant a host-ranking pipeline runs when
      // link COUNTS carry signal (Common Crawl's weighted host graph).
      pagerankWeighted(tradeEdgesWeighted(s, d), iters = 5, scale = 1000000000000L)
        .orderBy("node")
    },

    "graph_harmonic" -> { (s, d) =>
      // Harmonic centrality on the STRONG graph (the linkpred/
      // components scale posture): the all-sources pair frame is the
      // operator's irreducible output, so the repeat-signal threshold
      // is what keeps it core²-bounded instead of corpus-sized. 4 hops
      // x12 scale: LCM(1,2,3,4) = 12 makes every 1/d contribution an
      // exact integer (12, 6, 4, 3).
      harmonicCentrality(strongCoPurchaseEdges(s, d, 2), maxHops = 4, scale = 12L)
        .orderBy("part_id")
    },

    "graph_closeness" -> { (s, d) =>
      // Lin's index on the same strong graph / 4-hop horizon as
      // harmonic — the pair (n_reached, dist_sum) is exact integers,
      // and the x1e6 scale keeps n²·scale far inside 64 bits on the
      // core²-bounded strong graph.
      closenessCentrality(strongCoPurchaseEdges(s, d, 2), maxHops = 4, scale = 1000000L)
        .orderBy("part_id")
    },

    "graph_ego_betweenness" -> { (s, d) =>
      // Ego betweenness on the strong graph (the wedge-stream scale
      // posture shared with triangles/linkpred); x1e6 keeps every
      // scale div σ contribution integral and the sums tiny in 64 bits.
      egoBetweenness(strongCoPurchaseEdges(s, d, 2), scale = 1000000L)
        .orderBy("part_id")
    },

    "graph_hits" -> { (s, d) =>
      // HITS on the DIRECTED customer→supplier graph (bipartite — the
      // algorithm's native habitat). scale = 1e9: authority raw sums
      // are bounded by Σh ≈ scale, so the renormalization product
      // raw·scale stays ≤ ~1e18, inside 64 bits in BOTH engines (the
      // overflow line 1e12 would cross).
      hits(tradeEdgesDirected(s, d), iters = 4, scale = 1000000000L)
        .orderBy("side", "node")
    },

    "graph_kcore" -> { (s, d) =>
      // k=60 sits under the co-purchase graph's core-collapse
      // threshold at EVERY test scale (the avalanche point is sharp
      // and scale-dependent: k=70 empties the sf0.001 graph, k=90 the
      // sf0.01 one), so the 8 bounded rounds peel genuinely at each
      // sf and reach the true 60-core fixpoint — the dense backbone a
      // curation pipeline treats as "canonical cluster material".
      kcoreBounded(coPurchaseEdges(s, d), k = 60, rounds = 8).orderBy("part_id")
    }
  )

  private val edgesSql =
    """e AS (
      |  SELECT DISTINCT la.l_partkey AS u, lb.l_partkey AS v
      |  FROM lineitem la JOIN lineitem lb
      |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey)""".stripMargin

  /** One unrolled PageRank round: previous ranks flow along edges,
    * re-aggregate on dst; dst's own outdeg rides along for the next
    * round. DuckDB SUMs to HUGEINT — cast back to BIGINT so `//` and
    * the type gate stay in 64-bit. */
  private def prRound(k: Int): String =
    s"""r$k AS (
       |  SELECT d.src AS node, d.outdeg,
       |    CAST(b.base + (85 * SUM(p.r // p.outdeg)) // 100 AS BIGINT) AS r
       |  FROM edges e JOIN r${k - 1} p ON e.src = p.node
       |  JOIN deg d ON d.src = e.dst
       |  CROSS JOIN bs b
       |  GROUP BY 1, 2, b.base)""".stripMargin

  /** Oracle-side twin of [[pagerank]]: the deg/base/init CTEs plus
    * `iters` unrolled rounds over an `edges(src, dst)` CTE the caller
    * prepends. Public so every pagerank-based oracle (trade graph here,
    * TextRank's word graph) unrolls the SAME arithmetic. Ends at CTE
    * `r$iters(node, outdeg, r)`. */
  def pagerankOracleCtes(iters: Int, scale: Long): String =
    s"""deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
       |bs AS (SELECT CAST($scale AS BIGINT) // COUNT(*) AS init,
       |         (15 * (CAST($scale AS BIGINT) // COUNT(*))) // 100 AS base
       |       FROM deg),
       |r0 AS (SELECT src AS node, outdeg, b.init AS r FROM deg CROSS JOIN bs b),
       |${(1 to iters).map(prRound).mkString(",\n")}""".stripMargin

  /** One unrolled WEIGHTED round: previous ranks flow along edges
    * proportionally to weight over the sender's weight sum. */
  private def prwRound(k: Int): String =
    s"""r$k AS (
       |  SELECT d.src AS node, d.wsum,
       |    CAST(b.base + (85 * SUM((p.r * e.w) // p.wsum)) // 100 AS BIGINT) AS r
       |  FROM edges e JOIN r${k - 1} p ON e.src = p.node
       |  JOIN deg d ON d.src = e.dst
       |  CROSS JOIN bs b
       |  GROUP BY 1, 2, b.base)""".stripMargin

  /** Oracle-side twin of [[pagerankWeighted]] over an
    * `edges(src, dst, w)` CTE the caller prepends. */
  def pagerankWeightedOracleCtes(iters: Int, scale: Long): String =
    s"""deg AS (SELECT src, SUM(w) AS wsum FROM edges GROUP BY 1),
       |bs AS (SELECT CAST($scale AS BIGINT) // COUNT(*) AS init,
       |         (15 * (CAST($scale AS BIGINT) // COUNT(*))) // 100 AS base
       |       FROM deg),
       |r0 AS (SELECT src AS node, wsum, b.init AS r FROM deg CROSS JOIN bs b),
       |${(1 to iters).map(prwRound).mkString(",\n")}""".stripMargin

  /** Oracle-side twin of [[hits]] over a directed `pairs(src, dst)`
    * CTE the caller prepends: h0 init + `iters` unrolled
    * authority/hub half-rounds, each L1-renormalized to `scale` in
    * the identical integer arithmetic. DuckDB SUMs to HUGEINT — cast
    * back to BIGINT so `//` and the overflow line match the engine.
    * Ends at CTEs `a$iters(node, a)` and `h$iters(node, h)`. */
  def hitsOracleCtes(iters: Int, scale: Long): String = {
    // every CTE here is referenced >= 2x per unrolled round (the raw
    // frame feeds both its total and its renormalization; each side
    // feeds the next half-round) — MATERIALIZED, or DuckDB's CTE
    // inlining goes exponential in rounds (the kcore lesson; the
    // un-materialized draft spilled >60 GB at sf0.1 before dying)
    val rounds = (1 to iters).map { k =>
      val p = k - 1
      s"""ar$k AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS a
         |  FROM pairs e JOIN h$p h ON e.src = h.node GROUP BY 1),
         |at$k AS MATERIALIZED (SELECT CAST(SUM(a) AS BIGINT) AS tot FROM ar$k),
         |a$k AS MATERIALIZED (
         |  SELECT node, (a * $scale) // t.tot AS a FROM ar$k CROSS JOIN at$k t),
         |hr$k AS MATERIALIZED (SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS h
         |  FROM pairs e JOIN a$k a ON e.dst = a.node GROUP BY 1),
         |ht$k AS MATERIALIZED (SELECT CAST(SUM(h) AS BIGINT) AS tot FROM hr$k),
         |h$k AS MATERIALIZED (
         |  SELECT node, (h * $scale) // t.tot AS h FROM hr$k CROSS JOIN ht$k t)"""
        .stripMargin
    }.mkString(",\n")
    s"""hn AS MATERIALIZED (SELECT DISTINCT src AS node FROM pairs),
       |h0 AS MATERIALIZED (SELECT node,
       |  CAST($scale AS BIGINT) // (SELECT COUNT(*) FROM hn) AS h FROM hn),
       |$rounds""".stripMargin
  }

  /** Unrolled all-sources BFS over the strong co-purchase graph: per
    * hop, the previous FRONTIER joins the symmetric edge set and
    * already-seen pairs leave via NOT EXISTS against the cumulative
    * known set. Both frontier and known are referenced >= 2x per
    * round — MATERIALIZED, or DuckDB's CTE inlining goes exponential
    * in hops (the kcore lesson). Shared by the harmonic and closeness
    * oracles; ends at CTE `k$maxHops(n, m, d)`. */
  private def strongBfsCtes(maxHops: Int): String = {
    val strong = """p AS (
      |  SELECT la.l_partkey AS u, lb.l_partkey AS v
      |  FROM lineitem la JOIN lineitem lb
      |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(DISTINCT la.l_orderkey) >= 2),
      |sym AS MATERIALIZED (SELECT u AS x, v AS y FROM p UNION ALL SELECT v, u FROM p),
      |k0 AS MATERIALIZED (SELECT DISTINCT x AS n, x AS m, 0 AS d FROM sym),
      |f0 AS MATERIALIZED (SELECT n, m FROM k0)""".stripMargin
    val hops = (1 to maxHops).map { h =>
      val p = h - 1
      s"""f$h AS MATERIALIZED (
         |  SELECT DISTINCT f.n, e.y AS m FROM f$p f JOIN sym e ON f.m = e.x
         |  WHERE NOT EXISTS (SELECT 1 FROM k$p k WHERE k.n = f.n AND k.m = e.y)),
         |k$h AS MATERIALIZED (
         |  SELECT n, m, d FROM k$p UNION ALL SELECT n, m, $h FROM f$h)""".stripMargin
    }.mkString(",\n")
    s"""$strong,
       |$hops""".stripMargin
  }

  /** Oracle-side twin of [[labelPropagation]] over the strong
    * co-purchase graph: strong edges (CTE `p`), symmetric `sym`, l0 =
    * node ids, then `rounds` unrolled frequency votes (ROW_NUMBER
    * ORDER BY c DESC, lbl ASC ≡ the engine's struct-min). Every CTE
    * MATERIALIZED from the first draft (§4's rule — the HITS lesson).
    * Ends at `l$rounds(node, lbl)`; `p` stays visible for consumers
    * (modularity). */
  private def lpaOracleCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT e.dst AS node, l.lbl AS lbl, COUNT(*) AS c
         |  FROM sym e JOIN l${k - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$k AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |    FROM c$k) t WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""p AS (
       |  SELECT la.l_partkey AS u, lb.l_partkey AS v
       |  FROM lineitem la JOIN lineitem lb
       |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(DISTINCT la.l_orderkey) >= 2),
       |sym AS MATERIALIZED (
       |  SELECT u AS src, v AS dst FROM p UNION ALL SELECT v, u FROM p),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM sym),
       |$roundCtes""".stripMargin
  }

  /** Unrolled k-truss peel: per round, triangle listing on the prior
    * edge set, per-edge support, keep support ≥ k-2. Every CTE is
    * referenced ≥2× per round — MATERIALIZED from the first draft
    * (§4's rule). `pfx` namespaces the CTEs so two k values unroll in
    * one statement over the shared `e0`. */
  private def ktrussOracleCtes(pfx: String, minSup: Int, rounds: Int): String =
    (1 to rounds).map { r =>
      val p = if (r == 1) "e0" else s"${pfx}e${r - 1}"
      s"""${pfx}t$r AS MATERIALIZED (
         |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
         |  FROM $p e1 JOIN $p e2 ON e1.u = e2.u AND e1.v < e2.v
         |  JOIN $p e3 ON e3.u = e1.v AND e3.v = e2.v),
         |${pfx}s$r AS MATERIALIZED (
         |  SELECT u, v, COUNT(*) AS sup FROM (
         |    SELECT a AS u, b AS v FROM ${pfx}t$r
         |    UNION ALL SELECT a, c FROM ${pfx}t$r
         |    UNION ALL SELECT b, c FROM ${pfx}t$r) GROUP BY 1, 2),
         |${pfx}e$r AS MATERIALIZED (
         |  SELECT e.u, e.v FROM $p e JOIN ${pfx}s$r s
         |    ON e.u = s.u AND e.v = s.v
         |  WHERE s.sup >= $minSup)""".stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "graph_ktruss" ->
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT la.l_partkey AS u, lb.l_partkey AS v
         |  FROM lineitem la JOIN lineitem lb
         |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
         |  GROUP BY 1, 2 HAVING COUNT(DISTINCT la.l_orderkey) >= 2),
         |${ktrussOracleCtes("a_", 1, 5)},
         |${ktrussOracleCtes("b_", 2, 5)}
         |SELECT u, v, 3 AS k FROM a_e5
         |UNION ALL SELECT u, v, 4 FROM b_e5
         |ORDER BY k, u, v""".stripMargin,
    "graph_communities" ->
      s"""WITH ${lpaOracleCtes(4)}
         |SELECT node AS part_id, lbl AS community FROM l4
         |ORDER BY part_id""".stripMargin,

    "graph_modularity" ->
      s"""WITH ${lpaOracleCtes(4)},
         |lbl AS MATERIALIZED (SELECT node, lbl AS community FROM l4),
         |tagged AS MATERIALIZED (
         |  SELECT lu.community AS cu, lv.community AS cv
         |  FROM p JOIN lbl lu ON p.u = lu.node JOIN lbl lv ON p.v = lv.node),
         |m AS (SELECT COUNT(*) AS m FROM p),
         |intra AS (SELECT cu AS community, COUNT(*) AS l_c
         |  FROM tagged WHERE cu = cv GROUP BY 1),
         |degsum AS (SELECT community, COUNT(*) AS d_c FROM (
         |  SELECT cu AS community FROM tagged
         |  UNION ALL SELECT cv FROM tagged) GROUP BY 1)
         |SELECT d.community, COALESCE(i.l_c, 0) AS l_c, d.d_c,
         |  (1000000000 * COALESCE(i.l_c, 0)) // m.m
         |    - (1000000000 * d.d_c * d.d_c) // (4 * m.m * m.m) AS q_scaled
         |FROM degsum d LEFT JOIN intra i USING (community) CROSS JOIN m
         |ORDER BY d.community""".stripMargin,

    "graph_pagerank_weighted" ->
      s"""WITH pairs AS (
         |  SELECT o_custkey AS ck, l_suppkey AS sk,
         |    COUNT(DISTINCT o_orderkey) AS w
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |edges AS (
         |  SELECT 'c' || CAST(ck AS VARCHAR) AS src,
         |         's' || CAST(sk AS VARCHAR) AS dst, w FROM pairs
         |  UNION ALL
         |  SELECT 's' || CAST(sk AS VARCHAR),
         |         'c' || CAST(ck AS VARCHAR), w FROM pairs),
         |${pagerankWeightedOracleCtes(5, 1000000000000L)}
         |SELECT node, r AS rank_scaled FROM r5 ORDER BY node""".stripMargin,

    "graph_hits" ->
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         |    's' || CAST(l_suppkey AS VARCHAR) AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |${hitsOracleCtes(4, 1000000000L)}
         |SELECT node, h AS score, 'hub' AS side FROM h4
         |UNION ALL
         |SELECT node, a AS score, 'auth' AS side FROM a4
         |ORDER BY side, node""".stripMargin,

    "graph_degree" ->
      s"""WITH $edgesSql,
         |nodes AS (SELECT u AS n FROM e UNION ALL SELECT v FROM e),
         |deg AS (SELECT n, COUNT(*) AS dg FROM nodes GROUP BY 1)
         |SELECT dg AS degree, COUNT(*) AS n_parts
         |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_triangles" ->
      s"""WITH $edgesSql,
         |tri AS (
         |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
         |  FROM e ab JOIN e bc ON bc.u = ab.v
         |  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
         |nodes AS (
         |  SELECT a AS part_id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri)
         |SELECT part_id, COUNT(*) AS n_tri
         |FROM nodes GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT 'c' || CAST(ck AS VARCHAR) AS src,
         |         's' || CAST(sk AS VARCHAR) AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || CAST(sk AS VARCHAR),
         |         'c' || CAST(ck AS VARCHAR) FROM pairs),
         |${pagerankOracleCtes(5, 1000000000000L)}
         |SELECT node, r AS rank_scaled FROM r5 ORDER BY node""".stripMargin,

    "graph_linkpred" ->
      s"""WITH e AS (
         |  SELECT la.l_partkey AS u, lb.l_partkey AS v
         |  FROM lineitem la JOIN lineitem lb
         |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
         |  GROUP BY 1, 2 HAVING COUNT(DISTINCT la.l_orderkey) >= 2),
         |nb AS (SELECT u AS b, v AS a FROM e UNION ALL SELECT v, u FROM e),
         |cand AS (
         |  SELECT n1.a AS a, n2.a AS c, COUNT(*) AS cn
         |  FROM nb n1 JOIN nb n2 ON n1.b = n2.b AND n1.a < n2.a
         |  GROUP BY 1, 2),
         |new_pairs AS (
         |  SELECT a, c, cn FROM cand
         |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cand.a AND e.v = cand.c))
         |SELECT a, c, cn FROM new_pairs
         |ORDER BY cn DESC, a, c LIMIT 50""".stripMargin,

    "graph_components" ->
      """WITH RECURSIVE p AS (
        |  SELECT la.l_partkey AS u, lb.l_partkey AS v
        |  FROM lineitem la JOIN lineitem lb
        |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT la.l_orderkey) >= 2),
        |edges AS (SELECT u AS src, v AS dst FROM p UNION SELECT v, u FROM p),
        |reach(n, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src)
        |SELECT n AS part_id, MIN(m) AS comp FROM reach
        |GROUP BY n ORDER BY part_id""".stripMargin,

    "graph_assortativity" ->
      s"""WITH $edgesSql,
         |nodes AS (SELECT u AS n FROM e UNION ALL SELECT v FROM e),
         |deg AS (SELECT n, COUNT(*) AS dg FROM nodes GROUP BY 1),
         |sym AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
         |p AS (
         |  SELECT CAST(dx.dg AS DECIMAL(38,0)) AS dx,
         |         CAST(dy.dg AS DECIMAL(38,0)) AS dy
         |  FROM sym JOIN deg dx ON dx.n = sym.x JOIN deg dy ON dy.n = sym.y),
         |s AS (
         |  SELECT COUNT(*) AS m2, SUM(dx) AS sx, SUM(dy) AS sy,
         |    SUM(dx * dy) AS sxy, SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
         |  FROM p)
         |SELECT m2,
         |  ROUND(CAST(m2 * sxy - sx * sy AS DOUBLE)
         |    / (sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE))
         |      * sqrt(CAST(m2 * syy - sy * sy AS DOUBLE))), 6) AS assortativity
         |FROM s""".stripMargin,

    "graph_clustering" ->
      s"""WITH $edgesSql,
         |nodes AS (SELECT u AS n FROM e UNION ALL SELECT v FROM e),
         |deg AS (SELECT n, COUNT(*) AS dg FROM nodes GROUP BY 1),
         |tri AS (
         |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
         |  FROM e ab JOIN e bc ON bc.u = ab.v
         |  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
         |pt AS (
         |  SELECT part_id, COUNT(*) AS n_tri FROM (
         |    SELECT a AS part_id FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri) GROUP BY 1)
         |SELECT d.n AS part_id, d.dg AS degree,
         |  COALESCE(pt.n_tri, 0) AS n_tri,
         |  CASE WHEN d.dg >= 2 THEN
         |    ROUND(CAST(COALESCE(pt.n_tri, 0) AS DOUBLE) * 2 / (d.dg * (d.dg - 1)), 6)
         |  END AS coeff
         |FROM deg d LEFT JOIN pt ON pt.part_id = d.n
         |ORDER BY part_id""".stripMargin,

    "graph_triangles_approx" ->
      s"""WITH $edgesSql,
         |se AS (
         |  SELECT u, v FROM e
         |  WHERE CAST('0x' || substr(md5(CAST(u AS VARCHAR) || '_' ||
         |    CAST(v AS VARCHAR)), 1, 4) AS BIGINT) % 4 = 0),
         |tri AS (
         |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
         |  FROM se ab JOIN se bc ON bc.u = ab.v
         |  JOIN se ac ON ac.u = ab.u AND ac.v = bc.v)
         |SELECT CAST(COUNT(*) AS BIGINT) AS tri_sampled,
         |  CAST(COUNT(*) * 64 AS BIGINT) AS est_total FROM tri""".stripMargin,

    "graph_harmonic" ->
      s"""WITH ${strongBfsCtes(4)}
         |SELECT m AS part_id, COUNT(*) AS n_reached,
         |  CAST(SUM(12 // d) AS BIGINT) AS harmonic_scaled
         |FROM k4 WHERE d > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_ego_betweenness" -> {
      // nb feeds both wedge sides and `open` feeds both the σ count
      // and the contribution join — MATERIALIZED (the inlining lesson)
      """WITH p AS MATERIALIZED (
        |  SELECT la.l_partkey AS u, lb.l_partkey AS v
        |  FROM lineitem la JOIN lineitem lb
        |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT la.l_orderkey) >= 2),
        |nb AS MATERIALIZED (SELECT u AS c, v AS x FROM p UNION ALL SELECT v, u FROM p),
        |w AS MATERIALIZED (
        |  SELECT n1.c, n1.x AS s, n2.x AS t
        |  FROM nb n1 JOIN nb n2 ON n1.c = n2.c AND n1.x < n2.x),
        |open AS MATERIALIZED (
        |  SELECT c, s, t FROM w
        |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.u = w.s AND p.v = w.t)),
        |sig AS MATERIALIZED (SELECT s, t, COUNT(*) AS cn FROM open GROUP BY 1, 2)
        |SELECT o.c AS part_id, COUNT(*) AS n_open_wedges,
        |  CAST(SUM(1000000 // g.cn) AS BIGINT) AS eb_scaled
        |FROM open o JOIN sig g ON o.s = g.s AND o.t = g.t
        |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "graph_closeness" ->
      s"""WITH ${strongBfsCtes(4)}
         |SELECT m AS part_id, COUNT(*) AS n_reached,
         |  CAST(SUM(d) AS BIGINT) AS dist_sum,
         |  CAST((COUNT(*) * COUNT(*) * 1000000) // SUM(d) AS BIGINT) AS lin_scaled
         |FROM k4 WHERE d > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_kcore" -> {
      // e{p} is referenced three times per round — MATERIALIZED stops
      // DuckDB's CTE inlining from going 3^rounds exponential.
      val e0 = """e0 AS MATERIALIZED (
        |  SELECT DISTINCT la.l_partkey AS u, lb.l_partkey AS v
        |  FROM lineitem la JOIN lineitem lb
        |    ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey)""".stripMargin
      val rounds = (1 to 8).map { r =>
        val p = r - 1
        s"""d$r AS (SELECT n, COUNT(*) AS dg
           |  FROM (SELECT u AS n FROM e$p UNION ALL SELECT v FROM e$p) GROUP BY 1),
           |k$r AS (SELECT n FROM d$r WHERE dg >= 60),
           |e$r AS MATERIALIZED (SELECT u, v FROM e$p
           |  WHERE u IN (SELECT n FROM k$r) AND v IN (SELECT n FROM k$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH $e0,
         |$rounds
         |SELECT n AS part_id, COUNT(*) AS core_degree
         |FROM (SELECT u AS n FROM e8 UNION ALL SELECT v FROM e8)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )
}
