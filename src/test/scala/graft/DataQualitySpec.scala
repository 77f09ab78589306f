package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("xiCorrelation: hand-worked monotone/parabola/independent values; constant y is NULL") {
    // n = 9, no ties: monotone y gives the closed form 1 − 3/(n+1)
    // = 0.7; the parabola (a NON-monotone function Pearson r scores
    // ≈ 0) still lands 0.4; a shuffled y goes negative; constant y
    // has denominator 0 — honestly undefined
    val rows =
      (1 to 9).map(x => ("mono", x, x * 2.0)) ++
        (1 to 9).map(x => ("para", x, (x - 5.0) * (x - 5.0))) ++
        Seq(5.0, 1.0, 9.0, 2.0, 7.0, 3.0, 8.0, 4.0, 6.0).zipWithIndex
          .map { case (y, i) => ("ind", i + 1, y) } ++
        (1 to 9).map(x => ("flat", x, 7.0))
    val out = DataQuality.xiCorrelation(
      rows.toDF("g", "x", "y"), "g", "x", "y").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out("mono").contains(0.7))
    assert(out("para").contains(0.4))
    assert(out("ind").contains(-0.4625))
    assert(out("flat").isEmpty)
  }

  test("sequenceGaps: within-bucket, cross-bucket, and empty-bucket gaps match the global scan") {
    val df = Seq(1L, 2L, 5L, 6L, 23L, 25L).toDF("id")
    val out = DataQuality.sequenceGaps(df, "id", bucket = 10L).collect()
      .map(r => (r.getAs[Long]("after_id"), r.getAs[Long]("gap_len"))).toSet
    // global truth: (2,+2), (6,+16 across buckets 0→2, bucket 1 empty), (23,+1)
    assert(out == Set((2L, 2L), (6L, 16L), (23L, 1L)))
    // dense sequence → clean audit
    val dense = (10L to 15L).toDF("id")
    assert(DataQuality.sequenceGaps(dense, "id", bucket = 3L).count() == 0L)
  }

  test("freshness: lag against the corpus frontier, staleness gate") {
    val day = 86400000L
    val df = Seq(
      ("a", new java.sql.Timestamp(19000L * day)),
      ("a", new java.sql.Timestamp(19005L * day)), // frontier
      ("b", new java.sql.Timestamp(19002L * day)), // 3 days behind → stale at maxLag 1
      ("c", new java.sql.Timestamp(19004L * day))) // 1 day behind → fresh
      .toDF("k", "ts")
    val out = DataQuality.freshness(df, "k", "ts", 1).collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("lag_days"), r.getAs[Boolean]("stale"))).toMap
    assert(out("a") == ((0L, false)))
    assert(out("b") == ((3L, true)))
    assert(out("c") == ((1L, false)))
  }

  test("lDiversity: homogeneous classes flagged even when k-large") {
    // class (a): 5 rows, all sensitive 's1' → homogeneous despite size;
    // class (b): 2 rows, two sensitive values → diverse
    val df = (Seq.fill(5)(("a", "s1")) ++ Seq(("b", "s1"), ("b", "s2")))
      .toDF("q", "sv")
    val r = DataQuality.lDiversity(df, Seq("q"), "sv", 2).head()
    assert(r.getAs[Long]("n_classes") == 2L && r.getAs[Long]("n_rows") == 7L)
    assert(r.getAs[Long]("min_l") == 1L)
    assert(r.getAs[Long]("n_homogeneous_classes") == 1L)
    assert(r.getAs[Long]("n_exposed_rows") == 5L)
    assert(math.abs(r.getAs[Double]("exposed_share") - 5.0 / 7) < 1e-6)
  }

  test("kAnonymity: class sizes, risky rows, and share on a crafted QI set") {
    // classes: (a,x)=5 rows, (a,y)=2, (b,x)=1 → k=3 flags the last two
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++ Seq(("b", "x")))
      .toDF("q1", "q2")
    val r = DataQuality.kAnonymity(df, Seq("q1", "q2"), 3).head()
    assert(r.getAs[Long]("n_classes") == 3L && r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("min_class") == 1L)
    assert(r.getAs[Long]("n_small_classes") == 2L)
    assert(r.getAs[Long]("n_risky_rows") == 3L)
    assert(r.getAs[Double]("risky_share") == 0.375)
  }

  test("madProfile: median, MAD, and robust-outlier count on a crafted group") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq(10.0, 10.0, 10.0).map(("b", _))).toDF("g", "v")
    val out = DataQuality.madProfile(df, "g", "v").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    // a: median 3, |x−3| = {2,1,0,1,97} → MAD 1; only 97 > 4.4478·1
    assert(out("a").getAs[Double]("median") == 3.0)
    assert(out("a").getAs[Double]("mad") == 1.0)
    assert(out("a").getAs[Long]("n_robust_outliers") == 1L)
    // constant group: MAD 0 and no outliers (0 > 0 is false)
    assert(out("b").getAs[Double]("mad") == 0.0)
    assert(out("b").getAs[Long]("n_robust_outliers") == 0L)
  }

  test("chiSquare: 2x2 contingency with hand-computed expectations") {
    // a/x:30 a/y:10 b/x:10 b/y:50 — strongly dependent
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(50)(("b", "y"))
    val out = DataQuality.chiSquare(rows.toDF("u", "w"), "u", "w").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    assert(out.size == 4)
    val ax = out(("a", "x"))
    // e(a,x) = 40*40/100 = 16; contrib = (30-16)^2/16 = 12.25
    assert(ax.getAs[Long]("o") == 30L)
    assert(ax.getAs[Double]("expected") == 16.0)
    assert(ax.getAs[Double]("contrib") == 12.25)
    // χ² total for a 2x2 is symmetric in this layout
    val chi2 = out.values.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(chi2 - (12.25 + 196.0 / 24 + 196.0 / 24 + 196.0 / 36)) < 1e-5)
  }

  test("ksTwoSample: bucket decomposition equals the global D, ties break to lowest value") {
    // side1: {1,2,3,4}, side2: {3,4,5,6} — F1-F2 peaks at v=2 (2/4-0)
    // with bucketWidth 2.5 the values span three buckets
    val df = (Seq(1, 2, 3, 4).map(v => (v.toDouble, "p")) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, "q"))).toDF("v", "side")
    val out = DataQuality.ksTwoSample(df, "v",
      col("side") === "p", col("side") === "q", 2.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Double]("d_stat") == 0.5)
    assert(r.getAs[Double]("at_value") == 2.0)
    // identical populations → D = 0
    val same = Seq(1.0, 2.0, 3.0).flatMap(v => Seq((v, "p"), (v, "q"))).toDF("v", "side")
    val z = DataQuality.ksTwoSample(same, "v",
      col("side") === "p", col("side") === "q", 1.0).head()
    assert(z.getAs[Double]("d_stat") == 0.0)
  }

  test("benford: observed shares vs log10(1+1/d), sub-1 values excluded") {
    // 6 values with first digits 1,1,1,2,9 (+ one 0.5 that must drop)
    val df = Seq(12.3, 150.0, 1999.99, 25.0, 900.0, 0.5).toDF("v")
    val out = DataQuality.benford(df, "v").collect()
      .map(r => r.getAs[String]("digit") -> r).toMap
    assert(out.keySet == Set("1", "2", "9"))
    assert(out("1").getAs[Long]("n") == 3L)
    assert(out("1").getAs[Double]("share") == 0.6)
    // Benford expectation for digit 1 is log10(2) ≈ 0.30103
    assert(out("1").getAs[Double]("expected") == 0.30103)
    assert(math.abs(out("1").getAs[Double]("abs_dev") - 0.29897) < 1e-9)
    assert(out("9").getAs[Double]("expected") == 0.045757)
  }

  test("profile: one row per column with null/distinct/minmax stats") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(10.0)),
      (3L, Some("a"), None)
    ).toDF("id", "s", "v")
    val out = DataQuality.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "s", "v"))
    val s = out("s")
    assert(s.getAs[Long]("n_rows") == 3L)
    assert(s.getAs[Long]("n_null") == 1L)
    assert(s.getAs[Long]("n_distinct") == 1L)
    assert(s.getAs[String]("min_val") == "a")
    val v = out("v")
    assert(v.getAs[Long]("n_null") == 1L)
    // doubles render through DECIMAL(12,2)
    assert(v.getAs[String]("min_val") == "2.50")
    assert(v.getAs[String]("max_val") == "10.00")
  }

  test("profile runs as exactly TWO aggregation passes and zero sorts") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = DataQuality.profile(df).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    // one fold for counts/min/max + one Expand pass for the distincts —
    // never a scan per column
    assert(scans.length == 2, s"expected 2 scans of the input, got ${scans.length}")
    // the split exists to keep string min/max buffers OUT of the
    // expanded aggregate: fused, the SortAggregate fallback would SORT
    // |rows|×(|cols|+1) expanded rows. (An empty-key SortAggregate on
    // the fold side is fine — with no keys there is nothing to sort;
    // the smell is a physical Sort node.)
    val exec = DataQuality.profile(df).queryExecution.executedPlan
    val sorts = exec.collect { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty, s"unexpected Sort in:\n$exec")
  }

  test("histogram bins with closed top edge; constant column degrades to one bin") {
    val df = Seq(0.0, 2.5, 4.9, 5.0, 7.5, 10.0).toDF("x")
    // lo=0, hi=10, 4 bins of width 2.5: {0.0}, {2.5, 4.9}, {5.0},
    // {7.5, 10.0} — the max value 10.0 closes into bin 3
    val bins = DataQuality.histogram(df, "x", 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 2L))
    val const = Seq(7.0, 7.0, 7.0).toDF("x")
    val one = DataQuality.histogram(const, "x", 4).collect()
    assert(one.length == 1 && one.head.getLong(0) == 0L && one.head.getLong(1) == 3L)
  }

  test("uniqueness flags duplicate keys with multiplicity") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("k", "p")
    val dirty = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w")).toDF("k", "p")
    val out = DataQuality.uniqueness(Seq(
      ("clean", clean, Seq("k")),
      ("dirty", dirty, Seq("k")),
      ("composite", dirty, Seq("k", "p"))
    )).collect().map(r => r.getString(0) -> r).toMap
    assert(out("clean").getAs[Long]("n_dup_keys") == 0L)
    assert(out("clean").getAs[Long]("max_multiplicity") == 1L)
    assert(out("dirty").getAs[Long]("n_dup_keys") == 1L)
    assert(out("dirty").getAs[Long]("n_dup_rows") == 3L)
    assert(out("dirty").getAs[Long]("max_multiplicity") == 3L)
    // the composite key de-duplicates the same frame
    assert(out("composite").getAs[Long]("n_dup_keys") == 0L)
  }

  test("orphans counts broken and null foreign keys separately") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq(
      (1L, Some(10L)), (2L, Some(10L)),   // healthy
      (3L, Some(99L)), (4L, Some(99L)),   // orphaned, same missing key
      (5L, Some(77L)),                    // orphaned, second missing key
      (6L, None)                          // null FK
    ).toDF("id", "fk")
    val r = DataQuality.orphans(Seq(("child->parent", child, "fk", parent, "pk")))
      .collect().head
    assert(r.getAs[Long]("n_child_rows") == 6L)
    assert(r.getAs[Long]("n_orphans") == 3L)
    assert(r.getAs[Long]("n_orphan_keys") == 2L)
    assert(r.getAs[Long]("n_null_fk") == 1L)
  }

  test("ruleViolations folds predicates into per-frame conditional sums") {
    val df = Seq(0.5, 1.0, 49.0, 51.0, -1.0).toDF("q")
    val out = DataQuality.ruleViolations(Seq(
      ("q_in_1_50", df.withColumn("__viol", col("q") < 1 || col("q") > 50)),
      ("q_positive", df.withColumn("__viol", col("q") <= 0))
    )).collect().map(r => r.getString(0) -> r).toMap
    assert(out("q_in_1_50").getAs[Long]("n_checked") == 5L)
    assert(out("q_in_1_50").getAs[Long]("n_violations") == 3L)
    assert(out("q_positive").getAs[Long]("n_violations") == 1L)
  }

  test("functionalDeps: held FD reports zero violations, broken FD counts and bounds them") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),     // key 1: one rhs → holds
      (2L, "b", "y"), (2L, "b", "z"),     // key 2: two rhs → violates
      (3L, "c", "x")
    ).toDF("k", "held", "broken")
    val nullLhs = Seq((Some(1L), "x"), (None, "y"), (None, "z"))
      .toDF("k", "v")
    val out = DataQuality.functionalDeps(Seq(
      ("t.k->held", df, "k", "held"),
      ("t.k->broken", df, "k", "broken"),
      ("n.k->v", nullLhs, "k", "v")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("t.k->held") == ((3L, 0L, 1L)))
    assert(out("t.k->broken") == ((3L, 1L, 2L))) // key 2 violates, fan-out 2
    assert(out("n.k->v") == ((1L, 0L, 1L)))      // null lhs rows excluded
  }

  test("mutualInfo: identical columns give MI = H and NMI = 1; independence gives 0; nulls excluded") {
    import graft.operators.DataQuality
    // y = f(x) bijectively: MI = H(X) = -(2/3·ln(2/3) + 1/3·ln(1/3)),
    // NMI = 1 exactly (2·MI/(H+H))
    val dep = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("x", "y")
    val d = DataQuality.mutualInfo(Seq(("dep", dep, "x", "y"))).collect().head
    val h = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(d.getAs[Long]("n_rows") == 3L && d.getAs[Long]("n_cells") == 2L)
    assert(math.abs(d.getAs[Double]("mi_nats") - h) < 1e-5)
    assert(d.getAs[Double]("nmi") == 1.0)
    // a uniform 2x2 product distribution: every cell p = px·py -> MI 0
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val i = DataQuality.mutualInfo(Seq(("ind", ind, "x", "y"))).collect().head
    assert(i.getAs[Double]("mi_nats") == 0.0 && i.getAs[Double]("nmi") == 0.0)
    // null in either column drops the row before every count
    val withNull = Seq(("a", Integer.valueOf(1)), ("a", null.asInstanceOf[Integer]),
      ("b", Integer.valueOf(2))).toDF("x", "y")
    val n = DataQuality.mutualInfo(Seq(("n", withNull, "x", "y"))).collect().head
    assert(n.getAs[Long]("n_rows") == 2L && n.getAs[Long]("n_cells") == 2L)
  }

  test("entropy: uniform two-value column is ln2/1.0/0.5; constants are 0/null/0; nulls excluded") {
    val uniform = Seq("a", "a", "b", "b").toDF("c")
    val constant = Seq(Some("x"), Some("x"), None).toDF("c")
    val out = DataQuality.entropy(Seq(
      ("u", uniform, "c"), ("k", constant, "c")))
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("u")
    assert(u.getAs[Long]("n_distinct") == 2L && u.getAs[Long]("n_rows") == 4L)
    assert(u.getAs[Double]("entropy_nats") == 0.693147) // ln 2 @ 6dp
    assert(u.getAs[Double]("entropy_norm") == 1.0)      // perfectly uniform
    assert(u.getAs[Double]("gini") == 0.5)
    val k = out("k")
    assert(k.getAs[Long]("n_distinct") == 1L && k.getAs[Long]("n_rows") == 2L) // null dropped
    assert(k.getAs[Double]("entropy_nats") == 0.0)
    assert(k.isNullAt(k.fieldIndex("entropy_norm"))) // undefined at 1 value
    assert(k.getAs[Double]("gini") == 0.0)
  }

  test("corrMatrix: exact Pearson on full columns; pairwise-complete stats on nullable ones; degenerate guards") {
    // full columns (fast path): y = 2x exactly -> corr 1; z anti-corr
    val full = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val got = DataQuality.corrMatrix(full, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), Option(r.getAs[java.lang.Double]("corr")).map(_.toDouble))).toMap
    assert(got(("x", "y")) == ((3L, Some(1.0))))
    assert(got(("x", "z")) == ((3L, Some(-1.0))))
    // nullable column (conditional path): the pair (x,w) must use ONLY
    // rows where BOTH are present — rows 1,2,4: x=(1,2,4), w=(2,4,8)
    // -> corr 1 over n=3; a sum over inconsistent row sets (the r9
    // bug) would not return exactly 1
    val withNulls = Seq(
      (Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), None: Option[Double]), (Some(4.0), Some(8.0)),
      (None: Option[Double], Some(100.0)))
      .toDF("x", "w")
    val g2 = DataQuality.corrMatrix(withNulls, Seq("x", "w")).collect().head
    assert(g2.getAs[Long]("n") == 3L)
    assert(g2.getAs[Double]("corr") == 1.0)
    // zero variance -> NULL, both paths
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    assert(DataQuality.corrMatrix(const, Seq("a", "b")).collect().head.isNullAt(3))
    // an all-null pair -> n=0, NULL corr, no division blowup
    val allNull = Seq((Some(1.0), None: Option[Double]),
      (Some(2.0), None: Option[Double])).toDF("a", "b")
    val g3 = DataQuality.corrMatrix(allNull, Seq("a", "b")).collect().head
    assert(g3.getAs[Long]("n") == 0L && g3.isNullAt(3))
  }
}
