package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, TimestampType}

import graft.functions.Fx
import graft.sources.Tables

/** Data-quality / validation suite (SURVEY §2 snapshot-domain
  * companion): the checks a backup pipeline runs on a snapshot BEFORE
  * publishing it and AFTER restoring it — column profiles, key
  * uniqueness, referential integrity, and domain rules. The reference's
  * copy-validation story is byte-level ([[Snapshot.validateCopy]]);
  * this module is the semantic level: "the restored data is not just
  * the bytes we wrote, it is also internally consistent".
  *
  * Scale posture: every check is a single aggregation pass or an
  * anti-join on the relationship key.
  *  - [[profile]] computes ALL per-column stats (null count, distinct
  *    count, min/max) in ONE aggregate over the table — Catalyst plans
  *    the multi-distinct via Expand (one pass, map-side partials), and
  *    the wide 1-row result is reshaped to long form driver-free with
  *    `inline`. No per-column scans: profiling a 100 TB snapshot costs
  *    one read.
  *  - [[orphans]] is a left-anti join per relationship; dimension sides
  *    (orders→customer, customer→nation) broadcast automatically under
  *    AQE, the fact-fact one (lineitem→orders) shuffles on the join key
  *    exactly once.
  *  - [[ruleViolations]] folds every row rule into conditional sums in
  *    one scan; cross-table rules ride on one equi-join.
  *
  * Min/max render through the repo's canonical-string discipline
  * (Fx.canonical: doubles via tight DECIMAL, timestamps via epoch
  * micros) so the DuckDB oracle reproduces them byte-for-byte.
  */
object DataQuality {

  /** Canonical string rendering of a stats value for cross-engine
    * comparison: doubles through DECIMAL(12,2), timestamps through
    * epoch micros, everything else a plain string cast. */
  private def canonStat(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case DoubleType => Fx.decM(c).cast(StringType)
    // parquet ms-timestamps come back NTZ under Spark 4's inference;
    // route both flavors through epoch micros (session TZ is UTC)
    case TimestampType | org.apache.spark.sql.types.TimestampNTZType =>
      unix_micros(c.cast(TimestampType)).cast(StringType)
    case _ => c.cast(StringType)
  }

  /** Per-column profile of `df`: row count, null count, exact distinct
    * count, canonical min/max. Output is long-form — one row per
    * column — reshaped with `inline` (no driver round trip, no
    * per-column jobs).
    *
    * Two whole-table aggregates, deliberately SPLIT:
    *  - counts/min/max as one no-key fold (partial+final, no sort —
    *    keys are empty);
    *  - the multi-distincts alone in a second aggregate, planned via
    *    Expand with a pure-long buffer → HashAggregate.
    * Fused into ONE aggregate, the string min/max buffers would
    * disqualify HashAggregate for the WHOLE expanded aggregate (UnsafeRow
    * buffers must be mutable fixed-width), and Spark's SortAggregate
    * fallback then sorts |rows|×(|cols|+1) expanded wide rows — measured
    * 4× slower on this exact shape. Two columnar scans beat one sorted
    * expansion at every scale. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
    val basicAggs = count(lit(1)).as("n_rows") +: cols.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"__nn_${f.name}"),
        min(col(f.name)).as(s"__mn_${f.name}"),
        max(col(f.name)).as(s"__mx_${f.name}"))
    }
    val distinctAggs = cols.map(f => count_distinct(col(f.name)).as(s"__nd_${f.name}"))
    val wide = df.agg(basicAggs.head, basicAggs.tail: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    val rows = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"__nn_${f.name}")).as("n_null"),
        col(s"__nd_${f.name}").as("n_distinct"),
        canonStat(col(s"__mn_${f.name}"), f.dataType).as("min_val"),
        canonStat(col(s"__mx_${f.name}"), f.dataType).as("max_val"))
    }
    wide.select(inline(array(rows: _*)))
  }

  /** Key-uniqueness audit: for each (table, key columns) pair, how many
    * key values occur more than once, and the worst multiplicity.
    * One hash aggregate per table (map-side combinable), then a
    * |keys|-row second aggregate; results union into one report. */
  def uniqueness(tables: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    val reports = tables.map { case (name, df, keyCols) =>
      df.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(
          sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          sum(when(col("__n") > 1, col("__n")).otherwise(0L)).as("n_dup_rows"),
          max(col("__n")).as("max_multiplicity"))
        .select(lit(name).as("table_key"),
          col("n_dup_keys"), col("n_dup_rows"), col("max_multiplicity"))
    }
    reports.reduce(_.unionByName(_))
  }

  /** Referential-integrity audit: for each child→parent relationship,
    * the number of child rows whose foreign key has no parent (orphans)
    * and the number of distinct orphaned key values. Left-anti join on
    * the key; null FKs count as orphans of their own class ("a null
    * reference is still a broken reference" — reported separately so a
    * nullable-by-design FK can be whitelisted downstream). */
  def orphans(rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    val reports = rels.map { case (name, child, fk, parent, pk) =>
      val nullCount = child.agg(
        count(lit(1)).as("__n_child"),
        (count(lit(1)) - count(col(fk))).as("n_null_fk"))
      val orphanRows = child.filter(col(fk).isNotNull)
        .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      val orphanCount = orphanRows.agg(
        count(lit(1)).as("n_orphans"),
        count_distinct(col(fk)).as("n_orphan_keys"))
      nullCount.crossJoin(orphanCount)
        .select(lit(name).as("relationship"), col("__n_child").as("n_child_rows"),
          col("n_orphans"), col("n_orphan_keys"), col("n_null_fk"))
    }
    reports.reduce(_.unionByName(_))
  }

  /** Domain-rule audit: each rule is (name, frame, violation
    * predicate); all rules over the same frame SHOULD be passed
    * together so they fold into one scan's conditional sums. */
  def ruleViolations(rules: Seq[(String, DataFrame)]): DataFrame = {
    // each entry: (rule_name, frame-with-__viol-column)
    val reports = rules.map { case (name, flagged) =>
      flagged.agg(
        count(lit(1)).as("n_checked"),
        sum(col("__viol").cast(LongType)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
    }
    reports.reduce(_.unionByName(_))
  }

  /** Categorical distribution drift between two snapshots: per
    * category, both counts, both shares, and a chi-square-style
    * contribution (share_curr − share_base)² / share_base. Two hash
    * aggregates + one |categories|-row full-outer join; the share
    * normalization broadcasts a one-row totals frame (no global
    * window, no extra shuffle). Contributions are emitted PER
    * CATEGORY, not pre-summed — the caller picks its threshold, and
    * per-row doubles from exact counts are engine-identical where a
    * summed double would depend on addition order. */
  def drift(base: DataFrame, curr: DataFrame, cat: String): DataFrame = {
    val b = base.groupBy(col(cat).as("category")).agg(count(lit(1)).as("n_base"))
    val c = curr.groupBy(col(cat).as("category")).agg(count(lit(1)).as("n_curr"))
    val joined = b.join(c, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_curr"))
    val totals = joined.agg(sum(col("n_base")).as("t_base"), sum(col("n_curr")).as("t_curr"))
    joined.crossJoin(broadcast(totals))
      .withColumn("share_base",
        round(col("n_base").cast(DoubleType) / col("t_base"), 6))
      .withColumn("share_curr",
        round(col("n_curr").cast(DoubleType) / col("t_curr"), 6))
      .drop("t_base", "t_curr")
      .withColumn("chi2_contrib",
        round(when(col("share_base") > 0,
          (col("share_curr") - col("share_base")) * (col("share_curr") - col("share_base"))
            / col("share_base")), 6))
      // PSI contribution (the population-stability-index term the
      // model-monitoring world standardizes on: Σ ≥ 0.2 = major
      // shift); defined only where both shares are positive — a
      // category appearing or vanishing outright is already the
      // strongest possible signal and reads as null here
      .withColumn("psi_contrib",
        round(when(col("share_base") > 0 && col("share_curr") > 0,
          (col("share_curr") - col("share_base"))
            * log(col("share_curr") / col("share_base"))), 6))
  }

  /** Categorical concentration profile — Shannon entropy (nats),
    * normalized entropy (÷ ln distinct — 1.0 means uniform, → 0 means
    * one value dominates), and Gini impurity per labeled column: the
    * balance diagnostics behind partition-key and training-mixture
    * choices (a near-zero-entropy key is a skew hazard before any row
    * moves; a drifting mixture entropy is a corpus-composition alarm).
    * Scale shape per column: one map-side-combinable value count (the
    * shuffle carries distinct values, not rows), then the tiny count
    * frame crosses a broadcast one-row total — same shape as [[drift]].
    * Rounding happens once at the end from the unrounded sums so the
    * oracle can mirror the arithmetic token-for-token. */
  def entropy(cols: Seq[(String, DataFrame, String)]): DataFrame =
    cols.map { case (label, df, c) =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
      val totals = counts.agg(sum(col("n")).as("t"))
      counts.crossJoin(broadcast(totals))
        .withColumn("p", col("n").cast(DoubleType) / col("t"))
        .agg(
          count(lit(1)).as("n_distinct"),
          max(col("t")).as("n_rows"),
          (-sum(col("p") * log(col("p")))).as("ent"),
          (lit(1.0) - sum(col("p") * col("p"))).as("gini_raw"))
        .select(
          lit(label).as("col_name"),
          col("n_distinct"),
          col("n_rows"),
          round(col("ent"), 6).as("entropy_nats"),
          round(when(col("n_distinct") > 1,
            col("ent") / log(col("n_distinct").cast(DoubleType))), 6).as("entropy_norm"),
          round(col("gini_raw"), 6).as("gini"))
    }.reduce(_.unionByName(_))

  /** Mutual information between two categorical columns (nats) plus
    * the arithmetic-normalized NMI = 2·MI/(H(X)+H(Y)) — the
    * association diagnostic [[cramersV]]'s χ²-based V complements:
    * MI sees ANY dependence structure, not just contingency-table
    * imbalance, and NMI ∈ [0,1] compares across pairs with different
    * cardinalities (the feature-redundancy screen a training pipeline
    * runs before one-hot-ing two columns that say the same thing).
    * Scale shape: ONE map-side-combinable (x,y) cell count per pair —
    * the shuffle carries distinct cells, not rows; marginals re-derive
    * from the cell frame, totals cross a broadcast one-row frame.
    * Rounding happens once at the end from the unrounded sums so the
    * oracle mirrors the arithmetic token-for-token ([[entropy]]'s
    * discipline). */
  def mutualInfo(pairs: Seq[(String, DataFrame, String, String)]): DataFrame =
    pairs.map { case (label, df, x, y) =>
      val cells = df.filter(col(x).isNotNull && col(y).isNotNull)
        .groupBy(col(x).as("vx"), col(y).as("vy")).agg(count(lit(1)).as("n"))
      val nx = cells.groupBy("vx").agg(sum(col("n")).as("nx"))
      val ny = cells.groupBy("vy").agg(sum(col("n")).as("ny"))
      val tot = cells.agg(sum(col("n")).as("t"))
      def p(c: Column) = c.cast(DoubleType) / col("t")
      val miRow = cells.join(nx, Seq("vx")).join(ny, Seq("vy"))
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_cells"), max(col("t")).as("n_rows"),
          sum(p(col("n")) * log(p(col("n")) / (p(col("nx")) * p(col("ny")))))
            .as("mi"))
      val hxRow = nx.crossJoin(broadcast(tot))
        .agg((-sum(p(col("nx")) * log(p(col("nx"))))).as("hx"))
      val hyRow = ny.crossJoin(broadcast(tot))
        .agg((-sum(p(col("ny")) * log(p(col("ny"))))).as("hy"))
      miRow.crossJoin(hxRow).crossJoin(hyRow).select(
        lit(label).as("pair"), col("n_rows"), col("n_cells"),
        round(col("mi"), 6).as("mi_nats"),
        round(when(col("hx") + col("hy") > 0,
          lit(2.0) * col("mi") / (col("hx") + col("hy"))), 6).as("nmi"))
    }.reduce(_.unionByName(_))

  /** Functional-dependency audit: for each claimed `lhs → rhs`, how
    * many distinct lhs values exist, how many of them violate (map to
    * more than one rhs), and the worst fan-out — the schema-contract
    * check behind denormalized lake tables (a violated FD means the
    * "dimension attribute" someone denormalized is silently drifting).
    * One map-side-combinable (lhs, rhs)-distinct aggregate per dep;
    * the violation sum runs over the |distinct lhs| frame. */
  def functionalDeps(deps: Seq[(String, DataFrame, String, String)]): DataFrame =
    deps.map { case (label, df, lhs, rhs) =>
      df.filter(col(lhs).isNotNull)
        .groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
        .agg(
          count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
          max(col("n_rhs")).as("max_rhs_per_lhs"))
        .select(lit(label).as("fd"), col("n_lhs"), col("n_violating_lhs"),
          col("max_rhs_per_lhs"))
    }.reduce(_.unionByName(_))

  /** Equi-width histogram of a numeric column — the distribution view
    * [[profile]]'s scalar min/max can't give (skew, modes, outlier
    * mass). Two passes: a one-row global [lo, hi] aggregate (at 100 TB
    * this bound comes free from manifest/zone-map stats — the same
    * injection contract Percentiles' pass 1 uses), then ONE
    * map-side-combinable bin-count aggregate; the shuffle carries
    * ≤ nBins rows. Bin index is plain IEEE double math written
    * token-identically in the oracle, so boundaries are
    * engine-identical; the max value closes into the last bin. */
  def histogram(df: DataFrame, column: String, nBins: Int): DataFrame = {
    val c = col(column).cast(DoubleType)
    val b = df.agg(min(c).as("lo"), max(c).as("hi")).head()
    require(!b.isNullAt(0), s"histogram($column): column is all-null")
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val bin =
      if (hi <= lo) lit(0L) // constant column: one bin
      else least(floor((c - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)).cast(LongType),
        lit(nBins - 1L))
    df.filter(col(column).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(c), 2).as("min_v"), round(max(c), 2).as("max_v"))
  }

  /** Heavy-hitter / key-skew report: the k hottest values of a join or
    * partition key with their share of all rows and their multiple of
    * the mean key frequency — the diagnostic that decides whether a
    * join needs [[ScaleJoins.saltedJoin]] before the skewed reducer
    * becomes the straggler. One map-side-combinable count aggregate;
    * top-k goes through a distributed sort-limit (TakeOrdered, bounded
    * per-partition heaps — never a single-partition global window over
    * the key frame, which at 100 TB can itself be large); the ratios
    * derive from exact counts against a broadcast one-row totals frame.
    */
  def skew(df: DataFrame, column: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(column).as("key")).agg(count(lit(1)).as("cnt"))
      .materialize() // feeds totals AND top-k: one scan, not two
    val totals = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(k)
    top.crossJoin(broadcast(totals))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))).cast(LongType))
      .select(col("rk"), col("key"), col("cnt"),
        round(col("cnt").cast(DoubleType) / col("total"), 6).as("share"),
        round(col("cnt").cast(DoubleType) * col("n_keys") / col("total"), 4).as("x_mean"))
  }

  /** IQR outlier audit per group: Tukey fences at q1 − 1.5·IQR and
    * q3 + 1.5·IQR from the EXACT distributed quantiles
    * ([[Percentiles.exactQuantiles]] — bounded reducer memory at any
    * scale), then ONE conditional-sum scan against the broadcast
    * per-group fence frame counts values beyond each fence. The fence
    * arithmetic is written token-identically in the oracle so the
    * strict comparisons agree even at boundary values. */
  def outliers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val qs = Percentiles.exactQuantiles(df, groupCol, valueCol,
      Seq("q1" -> 0.25, "q3" -> 0.75))
    val fences = qs.select(col(groupCol),
      (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo_fence"),
      (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi_fence"))
    df.join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("lo_fence"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col(valueCol) > col("hi_fence"), 1L).otherwise(0L)).as("n_high"),
        round(min(col("lo_fence")), 4).as("lo_fence"),
        round(min(col("hi_fence")), 4).as("hi_fence"))
  }

  /** Benford first-significant-digit audit of a positive measure
    * column — the classic fabricated-/corrupted-data smell test for
    * financial-style magnitudes: observed share of each leading digit
    * vs Benford's law log10(1+1/d), with the absolute deviation. One
    * map-side-combinable count over 9 digit groups; expected shares
    * are constants folded at plan time. The comparison survives
    * cross-engine hashing because both shares and expectations round
    * at the output boundary (6 decimals — a whole digit class would
    * have to sit within 5e-7 of a boundary to flip, measure-zero). */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol) >= 1)
      .groupBy(substring(floor(col(valueCol)).cast(LongType).cast("string"), 1, 1)
        .as("digit"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("share", round(col("n").cast(DoubleType)
        / sum(col("n")).over(Window.partitionBy()), 6))
      .withColumn("expected", round(log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)), 6))
      .withColumn("abs_dev", round(abs(col("share") - col("expected")), 6))
  }

  /** Key-continuity audit: every gap in a (supposedly) dense BIGINT
    * key sequence, as (after_id, gap_len) — the "did the backup lose
    * rows?" completeness check a restore validation runs when keys
    * are expected contiguous (and the sparseness profile when they
    * are not). NEVER a global sort: ids hash-partition into fixed
    * ranges of `bucket` ids, the lead window runs WITHIN each bucket,
    * and cross-bucket gaps come from a lead over the |buckets|-row
    * min/max summary frame (empty buckets between two non-empty ones
    * fold into one boundary gap, exactly as the global scan would
    * report). */
  def sequenceGaps(df: DataFrame, idCol: String, bucket: Long = 65536L): DataFrame = {
    val ids = df.select(col(idCol).cast(LongType).as("id"))
      .withColumn("b", expr(s"id div ${bucket}L"))
    val inBucket = Window.partitionBy("b").orderBy("id")
    val within = ids
      .withColumn("next", lead(col("id"), 1).over(inBucket))
      .filter(col("next") - col("id") > 1)
      .select(col("id").as("after_id"), (col("next") - col("id") - 1).as("gap_len"))
    val summary = ids.groupBy("b")
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
    val byB = Window.orderBy("b") // |buckets| rows — metadata-sized
    val boundary = summary
      .withColumn("next_lo", lead(col("lo"), 1).over(byB))
      .filter(col("next_lo").isNotNull && col("next_lo") - col("hi") > 1)
      .select(col("hi").as("after_id"), (col("next_lo") - col("hi") - 1).as("gap_len"))
    within.unionByName(boundary)
  }

  /** Exact pairwise Pearson correlation matrix over numeric columns —
    * the multicollinearity / redundant-feature audit run before any
    * column ships into a training set. A decimal-free nullability
    * probe, then ONE aggregation pass collects ALL sufficient
    * statistics as exact decimals, and every statistic
    * for a pair (a,b) is CONDITIONED on both a and b being non-null —
    * the standard pairwise-complete-observations contract — so nullable
    * feature columns get consistent n/sums/cross-products per pair
    * instead of silently mixing row populations. DECIMAL(18,4) inputs
    * keep every product inside DECIMAL(38) exactly (built-in corr()
    * would rescan per pair AND accumulate order-dependently); inputs
    * with more than 4 decimal places are quantized to 4 dp by that
    * cast — the documented precision of the exactness contract
    * (widening the scale would push products past DECIMAL(38)). The
    * one-row stats frame is checkpointed and the |pairs| output rows
    * are metadata-sized selects over it. The closed form runs in
    * double on identical integer-exact inputs with a zero-variance /
    * empty-pair NULL guard; `n` in the output is the pair's complete-
    * observation count. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val dec = DecimalType(18, 4)
    val pairCols = cols.combinations(2).toSeq
    def k(a: String, b: String) = s"${a}__$b"
    // Nullability probe first: count() per column is a decimal-free
    // scan costing a fraction of the stats pass. On fully-populated
    // inputs (the common feature-audit case) every pair's complete-
    // observation frame IS the table, so per-column sums are SHARED
    // across pairs — O(cols) decimal aggregates instead of O(pairs)·6
    // conditional ones (measured 2.4× on the shipped 4-column query).
    val probe = df.agg(count(lit(1)).as("__n"),
      cols.map(c => count(col(c)).as(s"__n_$c")): _*).head()
    val total = probe.getAs[Long]("__n")
    val noNulls = cols.forall(c => probe.getAs[Long](s"__n_$c") == total)
    def dd(c: String) = col(c).cast(DoubleType)
    if (noNulls) {
      val aggs = cols.flatMap(c => Seq(
          sum(col(c).cast(dec)).as(s"s_$c"),
          sum(col(c).cast(dec) * col(c).cast(dec)).as(s"ss_$c"))) ++
        pairCols.map { case Seq(a, b) =>
          sum(col(a).cast(dec) * col(b).cast(dec)).as(s"p_${k(a, b)}")
        } :+ count(lit(1)).as("n")
      val g = df.agg(aggs.head, aggs.tail: _*).materialize()
      val nd = col("n").cast(DoubleType)
      val rows = pairCols.map { case Seq(a, b) =>
        val den = (nd * dd(s"ss_$a") - dd(s"s_$a") * dd(s"s_$a")) *
          (nd * dd(s"ss_$b") - dd(s"s_$b") * dd(s"s_$b"))
        g.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          when(den <= 0, lit(null).cast(DoubleType))
            .otherwise(round((nd * dd(s"p_${k(a, b)}") - dd(s"s_$a") * dd(s"s_$b"))
              / sqrt(den), 6)).as("corr"))
      }
      rows.reduce(_.unionByName(_))
    } else {
      // nullable inputs: per-pair conditional sufficient statistics —
      // every stat for (a,b) conditioned on BOTH non-null, the
      // pairwise-complete-observations contract
      val aggs = pairCols.flatMap { case Seq(a, b) =>
        val both = col(a).isNotNull && col(b).isNotNull
        val ca = when(both, col(a).cast(dec))
        val cb = when(both, col(b).cast(dec))
        Seq(
          count(when(both, lit(1))).as(s"n_${k(a, b)}"),
          sum(ca).as(s"sa_${k(a, b)}"), sum(cb).as(s"sb_${k(a, b)}"),
          sum(ca * ca).as(s"ssa_${k(a, b)}"), sum(cb * cb).as(s"ssb_${k(a, b)}"),
          sum(ca * cb).as(s"p_${k(a, b)}"))
      }
      val g = df.agg(aggs.head, aggs.tail: _*).materialize()
      val rows = pairCols.map { case Seq(a, b) =>
        val nd = dd(s"n_${k(a, b)}")
        val den = (nd * dd(s"ssa_${k(a, b)}") - dd(s"sa_${k(a, b)}") * dd(s"sa_${k(a, b)}")) *
          (nd * dd(s"ssb_${k(a, b)}") - dd(s"sb_${k(a, b)}") * dd(s"sb_${k(a, b)}"))
        g.select(lit(a).as("col_a"), lit(b).as("col_b"), col(s"n_${k(a, b)}").as("n"),
          when(col(s"n_${k(a, b)}") === 0 || den <= 0, lit(null).cast(DoubleType))
            .otherwise(round((nd * dd(s"p_${k(a, b)}") - dd(s"sa_${k(a, b)}") * dd(s"sb_${k(a, b)}"))
              / sqrt(den), 6)).as("corr"))
      }
      rows.reduce(_.unionByName(_))
    }
  }

  /** Chi-square independence audit of two categorical columns — "is
    * event mix stable across the week / sources / shards": the
    * (catA × catB) contingency table with observed count, expected
    * count under independence, and each cell's χ² contribution. One
    * map-side-combinable count over |A|×|B| cells; the marginals are
    * window sums over that metadata-sized frame, never a second scan.
    * All inputs to the double math are exact integers, so the stat
    * hashes identically cross-engine (divisions happen once per cell
    * at the output boundary). */
  def chiSquare(df: DataFrame, catA: String, catB: String): DataFrame = {
    val cells = df.groupBy(col(catA).as("a"), col(catB).as("b"))
      .agg(count(lit(1)).as("o"))
    cells
      .withColumn("row_t", sum(col("o")).over(Window.partitionBy("a")))
      .withColumn("col_t", sum(col("o")).over(Window.partitionBy("b")))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("e",
        col("row_t").cast(DoubleType) * col("col_t") / col("n"))
      .select(col("a"), col("b"), col("o"), round(col("e"), 4).as("expected"),
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6)
          .as("contrib"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of two row populations, EXACTLY and without a
    * global sort: D = sup_v |F₁(v) − F₂(v)| decomposes by value-range
    * bucket — within-bucket cumulative counts run in a window
    * partitioned by bucket (parallel), and each bucket's exclusive
    * prefix offsets fold out of a running sum over the |buckets|-row
    * summary frame (the dq_sequence_gaps / interArrival discipline).
    * The sup compares INTEGER cross-products |F₁n₁n₂ − F₂n₁n₂| as
    * decimals (n² overflows a LONG on a 10¹⁰-row table), so the max is
    * exact; the single division to D happens at the output boundary.
    * Returns one row: n₁, n₂, the KS statistic, and the LOWEST value
    * attaining it (deterministic under ties). */
  def ksTwoSample(df: DataFrame, valueCol: String, side1: Column, side2: Column,
      bucketWidth: Double): DataFrame = {
    val dec = DecimalType(38, 0)
    val vals = df.filter(side1 || side2)
      .select(col(valueCol).as("v"),
        when(side1, 1L).otherwise(0L).as("s1"),
        when(side2, 1L).otherwise(0L).as("s2"))
      .withColumn("bk", floor(col("v") / bucketWidth))
    val agg = vals.groupBy("bk", "v")
      .agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
    val inBucket = Window.partitionBy("bk").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = agg
      .withColumn("cum1", sum(col("c1")).over(inBucket))
      .withColumn("cum2", sum(col("c2")).over(inBucket))
    val byBk = Window.orderBy("bk") // |buckets| rows — metadata-sized
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = agg.groupBy("bk")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      .withColumn("off1", coalesce(sum(col("t1")).over(byBk), lit(0L)))
      .withColumn("off2", coalesce(sum(col("t2")).over(byBk), lit(0L)))
      .select(col("bk"), col("off1"), col("off2"))
    val tot = vals.agg(sum(col("s1")).as("n1"), sum(col("s2")).as("n2"))
    cum.join(broadcast(offsets), Seq("bk"))
      .crossJoin(broadcast(tot))
      .withColumn("num", abs(
        (col("off1") + col("cum1")).cast(dec) * col("n2")
          - (col("off2") + col("cum2")).cast(dec) * col("n1")))
      .groupBy("n1", "n2")
      .agg(max(struct(col("num"), (-col("v")).as("negv"))).as("m"))
      .select(col("n1"), col("n2"),
        round(col("m.num").cast(DoubleType)
          / (col("n1").cast(DoubleType) * col("n2")), 6).as("d_stat"),
        round(-col("m.negv"), 2).as("at_value"))
  }

  /** Robust dispersion audit per group: exact median, median absolute
    * deviation, and the count of robust outliers (|x−m| > 3·1.4826·MAD
    * — the σ-consistent MAD rule that doesn't let the outliers inflate
    * their own threshold the way dq_outliers' IQR fences can on small
    * groups). Built on Percentiles.exactQuantiles (bounded-memory
    * two-pass selection, never a value buffer per group); the median
    * ROUNDS before the deviation pass so both engines feed bit-equal
    * inputs to the second quantile; the |groups|-row median/MAD frames
    * broadcast back — three passes total, all map-side combinable. */
  def madProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = Percentiles.exactQuantiles(df, groupCol, valueCol, Seq("m" -> 0.5))
      .select(col(groupCol), round(col("m"), 4).as("m"))
    // narrow (group, m, adev) projection materialized ONCE: the MAD
    // quantile makes two more passes and the outlier count a fourth —
    // without the checkpoint each re-reads (and re-joins) the fact
    // table, measured 9.4 s → 2.4 s warm at sf1
    val dev = df.join(broadcast(med), groupCol)
      .select(col(groupCol), col("m"),
        abs(col(valueCol).cast(DoubleType) - col("m")).as("adev"))
      .materialize()
    val mad = Percentiles.exactQuantiles(dev, groupCol, "adev", Seq("mad" -> 0.5))
      .select(col(groupCol), round(col("mad"), 4).as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), min(col("m")).as("median"), min(col("mad")).as("mad_out"),
        sum(when(col("adev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
          .as("n_robust_outliers"))
      .withColumnRenamed("mad_out", "mad")
  }

  /** K-ANONYMITY audit over a quasi-identifier column set — the
    * re-identification risk gate run before a dataset (or a training
    * corpus with user-derived fields) is released: every row whose
    * QI equivalence class holds fewer than `k` rows is individually
    * distinguishable. One combinable count over |QI classes| cells,
    * then one tiny aggregate over the class-size frame — never a
    * second data scan; all ratios integer-fed at the boundary.
    * Returns one row: classes, rows, the smallest class, classes
    * and rows under k, and the risky-row share. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2)
    val classes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("c"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("c")).as("n_rows"),
      min(col("c")).as("min_class"),
      sum(when(col("c") < k, 1L).otherwise(0L)).as("n_small_classes"),
      sum(when(col("c") < k, col("c")).otherwise(0L)).as("n_risky_rows"))
      .withColumn("risky_share",
        round(col("n_risky_rows").cast(DoubleType) / col("n_rows"), 6))
  }

  /** L-DIVERSITY audit — [[kAnonymity]]'s companion: a QI class can
    * be k-large yet still leak if everyone in it shares one SENSITIVE
    * value (homogeneity attack), so each class additionally needs ≥ l
    * distinct sensitive values. One combinable distinct-count per QI
    * class + one tiny aggregate over the |classes| frame. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty && l >= 2)
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("c"), countDistinct(col(sensitiveCol)).as("lv"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("c")).as("n_rows"),
      min(col("lv")).as("min_l"),
      sum(when(col("lv") < l, 1L).otherwise(0L)).as("n_homogeneous_classes"),
      sum(when(col("lv") < l, col("c")).otherwise(0L)).as("n_exposed_rows"))
      .withColumn("exposed_share",
        round(col("n_exposed_rows").cast(DoubleType) / col("n_rows"), 6))
  }

  /** Data-freshness audit per stream partition — "which feeds went
    * quiet": each key's last event time, its lag behind the corpus
    * frontier in whole days, and a staleness flag past `maxLagDays`.
    * The frontier is one tiny aggregate broadcast back; one combinable
    * max per key — the arrival-monitoring half of [[drift]]'s content
    * monitoring. */
  def freshness(df: DataFrame, keyCol: String, tsCol: String,
      maxLagDays: Int): DataFrame = {
    val per = df.groupBy(keyCol)
      .agg(max(to_date(col(tsCol))).as("last_day"), count(lit(1)).as("n_events"))
    val frontier = per.agg(max(col("last_day")).as("frontier"))
    per.crossJoin(broadcast(frontier))
      .select(col(keyCol), col("n_events"), col("last_day"),
        datediff(col("frontier"), col("last_day")).cast(LongType).as("lag_days"))
      .withColumn("stale", col("lag_days") > maxLagDays)
  }

  /** Chatterjee's ξ rank correlation (JASA 2021), ties-robust form —
    * the dependence measure [[corrMatrix]]'s Pearson r cannot see:
    * ξ → 1 iff y is (near) a measurable FUNCTION of x — any shape,
    * oscillating included — and ≈ 0 under independence, while r only
    * detects linear trends. With rows ordered by x within each group,
    * r_i = #{y_j ≤ y_i}, l_i = #{y_j ≥ y_i}:
    *
    *   ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i·(n − l_i))
    *
    * Every term is an INTEGER from three windows over the grouped
    * frame (count-with-peers over the y order both ways, one lead over
    * the x order), so the single double division at the boundary is
    * cross-engine exact. Degenerate groups (constant y ⇒ denominator
    * 0) answer NULL, honestly undefined. Callers group first: run it
    * over an already-aggregated frame (per-type daily sums here) so
    * the windows cover metadata-sized partitions, never raw events. */
  def xiCorrelation(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val byG = Window.partitionBy(groupCol)
    val byY = byG.orderBy(col(yCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val byYDesc = byG.orderBy(col(yCol).desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val byX = byG.orderBy(col(xCol))
    df.select(col(groupCol), col(xCol), col(yCol))
      .withColumn("r", count(lit(1)).over(byY))
      .withColumn("l", count(lit(1)).over(byYDesc))
      .withColumn("nn", count(lit(1)).over(byG))
      .withColumn("dr", abs(lead(col("r"), 1).over(byX) - col("r")))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_obs"),
        sum(col("dr")).as("sumdiff"),
        sum(col("l") * (col("nn") - col("l"))).as("denom"))
      .select(col(groupCol), col("n_obs"),
        when(col("denom") === 0, lit(null).cast(DoubleType)).otherwise(
          round(lit(1.0) - (col("n_obs") * col("sumdiff")).cast(DoubleType)
            / (col("denom") * 2).cast(DoubleType), 6)).as("xi"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_freshness" -> { (s, d) =>
      freshness(Tables.events(s, d), "event_type", "ts", 1).orderBy("event_type")
    },

    "dq_ldiv" -> { (s, d) =>
      // QI (nation, segment) classes; the account-balance SIGN is the
      // sensitive value (l = 2: a class where everyone is in debt —
      // or no one — leaks the attribute for every member).
      lDiversity(
        Tables.customer(s, d).withColumn("bal_sign",
          when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("nonneg"))),
        Seq("c_nationkey", "c_mktsegment"), "bal_sign", 2)
    },

    "dq_kanon" -> { (s, d) =>
      // customers' (nation, segment) quasi-identifier at k=10
      kAnonymity(Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"), 10)
    },

    "dq_mad" -> { (s, d) =>
      madProfile(Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")
    },

    "dq_chisq" -> { (s, d) =>
      // event mix × ISO weekday (0 = Monday, DuckDB isodow−1): the
      // "did the weekly rhythm change" independence audit.
      chiSquare(
        Tables.events(s, d).withColumn("dow", weekday(col("ts")).cast(LongType)),
        "event_type", "dow")
        .withColumnRenamed("a", "event_type").withColumnRenamed("b", "dow")
        .orderBy("event_type", "dow")
    },

    "dq_corr_matrix" -> { (s, d) =>
      // Multicollinearity audit over lineitem's numeric measures —
      // one scan, all six pairs, exact sufficient statistics.
      corrMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    },

    "dq_xicor" -> { (s, d) =>
      // Is daily volume a FUNCTION of calendar time, per type? ξ on
      // the per-type (day → daily value sum) frame — metadata-sized
      // (|types|·|days| rows), so the per-group windows are trivial
      // however many raw events fed the aggregate.
      xiCorrelation(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(Fx.decV(col("value"))).as("sv")),
        "event_type", "day", "sv").orderBy("event_type")
    },

    "dq_cramers_v" -> { (s, d) =>
      // Effect size for dq_chisq's independence audit, one summary
      // row: χ² says WHETHER the event mix departs from the weekly
      // rhythm, Cramér's V says HOW MUCH on a 0..1 scale comparable
      // across tables of any size (the number a drift dashboard
      // thresholds on). Cells are exact integer counts; each cell's
      // 6-dp contribution is pinned to DECIMAL before the fold so the
      // χ² total is order-independent (a double sum would drift with
      // partitioning); dof uses OBSERVED category counts. Runs over
      // the tiny |types × 7| cell frame.
      val cells = chiSquare(
        Tables.events(s, d).withColumn("dow", weekday(col("ts")).cast(LongType)),
        "event_type", "dow")
      cells
        .agg(sum(col("o")).as("n"),
          sum(col("contrib").cast(DecimalType(28, 6))).as("chi2x"),
          countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
        .select(col("n"),
          round(col("chi2x").cast(DoubleType), 6).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          round(sqrt(col("chi2x").cast(DoubleType)
            / (col("n").cast(DoubleType)
              * least(col("r") - 1, col("c") - 1).cast(DoubleType))), 6)
            .as("cramers_v"))
    },

    "dq_ks" -> { (s, d) =>
      // Are finished and open orders drawn from the same price
      // distribution? (They are by construction — D should be small —
      // but the STATISTIC is what the oracle pins, exactly.)
      ksTwoSample(Tables.orders(s, d), "o_totalprice",
        col("o_orderstatus") === "F", col("o_orderstatus") === "O", 10000.0)
    },

    "dq_sequence_gaps" -> { (s, d) =>
      // Audit one logical partition (open orders) so the gap profile
      // is non-trivial — the full keyspace is dense by construction
      // (on which the audit provably returns 0 rows; spec covers it).
      sequenceGaps(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
        "o_orderkey").orderBy("after_id")
    },

    "dq_benford" -> { (s, d) =>
      benford(Tables.orders(s, d), "o_totalprice").orderBy("digit")
    },

    "dq_profile" -> { (s, d) =>
      profile(Tables.orders(s, d)).orderBy("column")
    },

    "dq_outliers" -> { (s, d) =>
      outliers(Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")
    },

    "dq_skew" -> { (s, d) =>
      skew(Tables.orders(s, d), "o_custkey", 10).orderBy("rk")
    },

    "dq_histogram" -> { (s, d) =>
      histogram(Tables.lineitem(s, d), "l_extendedprice", 20).orderBy("bin")
    },

    "dq_unique" -> { (s, d) =>
      uniqueness(Seq(
        ("orders:o_orderkey", Tables.orders(s, d), Seq("o_orderkey")),
        ("customer:c_custkey", Tables.customer(s, d), Seq("c_custkey")),
        ("lineitem:l_orderkey+l_linenumber", Tables.lineitem(s, d),
          Seq("l_orderkey", "l_linenumber")),
        ("documents:doc_id", Tables.documents(s, d), Seq("doc_id")),
        // documents carry intentional near/exact dups at the TEXT level;
        // text-hash multiplicity is the "expected duplication" gauge the
        // cleaning pipeline consumes (non-zero by design).
        ("documents:text_hash", Tables.documents(s, d)
          .select(md5(Fx.normText(col("text"))).as("text_hash")), Seq("text_hash"))
      )).orderBy("table_key")
    },

    "dq_refint" -> { (s, d) =>
      orphans(Seq(
        ("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        ("lineitem.l_partkey->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"),
        ("lineitem.l_suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"),
        ("orders.o_custkey->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        ("customer.c_nationkey->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey")
      )).orderBy("relationship")
    },

    "dq_drift" -> { (s, d) =>
      // Drift between "the snapshot through 1997" and "1998 onward":
      // did the priority mix shift? (The pre-publish gate a backup
      // pipeline runs next to byte validation.)
      val ord = Tables.orders(s, d)
      drift(
        ord.filter(col("o_orderdate") < "1998-01-01"),
        ord.filter(col("o_orderdate") >= "1998-01-01"),
        "o_orderpriority").orderBy("category")
    },

    "dq_entropy" -> { (s, d) =>
      // Concentration profile of the keys a pipeline partitions and
      // mixes by: event types, order priorities, document languages
      // and sources — one count pass per column, all metadata-sized.
      entropy(Seq(
        ("documents.lang", Tables.documents(s, d), "lang"),
        ("documents.source", Tables.documents(s, d), "source"),
        ("events.event_type", Tables.events(s, d), "event_type"),
        ("orders.o_orderpriority", Tables.orders(s, d), "o_orderpriority")))
        .orderBy("col_name")
    },

    "dq_mutual_info" -> { (s, d) =>
      // Association screens across cardinalities: the TPC-H
      // flag~status pair (structurally dependent), priority~status,
      // and the corpus lang~source mixture.
      mutualInfo(Seq(
        ("lineitem.flag~status", Tables.lineitem(s, d),
          "l_returnflag", "l_linestatus"),
        ("orders.priority~status", Tables.orders(s, d),
          "o_orderpriority", "o_orderstatus"),
        ("documents.lang~source", Tables.documents(s, d), "lang", "source")))
        .orderBy("pair")
    },

    "dq_funcdep" -> { (s, d) =>
      // One contract that HOLDS (nation key → region) and three that
      // do not — the audit shape: assert the zeros, quantify the rest.
      functionalDeps(Seq(
        ("nation.n_nationkey->n_regionkey", Tables.nation(s, d),
          "n_nationkey", "n_regionkey"),
        ("part.p_brand->p_type", Tables.part(s, d), "p_brand", "p_type"),
        ("customer.c_nationkey->c_mktsegment", Tables.customer(s, d),
          "c_nationkey", "c_mktsegment"),
        ("orders.o_custkey->o_orderpriority", Tables.orders(s, d),
          "o_custkey", "o_orderpriority")))
        .orderBy("fd")
    },

    "dq_rules" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      // cross-table rule: a lineitem must not ship before its order date
      val shipped = li.select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
          Seq("l_orderkey"))
      ruleViolations(Seq(
        ("lineitem.quantity_in_1_50",
          li.withColumn("__viol", col("l_quantity") < 1 || col("l_quantity") > 50)),
        ("lineitem.discount_in_0_0.2",
          li.withColumn("__viol", col("l_discount") < 0 || col("l_discount") > 0.2)),
        ("lineitem.price_positive",
          li.withColumn("__viol", col("l_extendedprice") <= 0)),
        ("orders.totalprice_positive",
          ord.withColumn("__viol", col("o_totalprice") <= 0)),
        ("lineitem.ship_after_order",
          shipped.withColumn("__viol", col("l_shipdate") < col("o_orderdate")))
      )).orderBy("rule")
    }
  )

  val oracles: Map[String, String] = Map(
    "dq_freshness" ->
      """WITH per AS (
        |  SELECT event_type, MAX(CAST(ts AS DATE)) AS last_day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1),
        |f AS (SELECT MAX(last_day) AS frontier FROM per)
        |SELECT event_type, n_events, last_day,
        |  CAST(date_diff('day', last_day, frontier) AS BIGINT) AS lag_days,
        |  date_diff('day', last_day, frontier) > 1 AS stale
        |FROM per CROSS JOIN f ORDER BY event_type""".stripMargin,

    "dq_ldiv" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS c,
        |    COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END) AS lv
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(MIN(lv) AS BIGINT) AS min_l,
        |  CAST(SUM(CASE WHEN lv < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_homogeneous_classes,
        |  CAST(SUM(CASE WHEN lv < 2 THEN c ELSE 0 END) AS BIGINT) AS n_exposed_rows,
        |  ROUND(CAST(SUM(CASE WHEN lv < 2 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6)
        |    AS exposed_share
        |FROM cls""".stripMargin,

    "dq_kanon" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS c
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(MIN(c) AS BIGINT) AS min_class,
        |  CAST(SUM(CASE WHEN c < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
        |  CAST(SUM(CASE WHEN c < 10 THEN c ELSE 0 END) AS BIGINT) AS n_risky_rows,
        |  ROUND(CAST(SUM(CASE WHEN c < 10 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6)
        |    AS risky_share
        |FROM cls""".stripMargin,

    "dq_mad" ->
      """WITH med AS (
        |  SELECT l_returnflag, ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS m
        |  FROM lineitem GROUP BY 1),
        |dev AS (
        |  SELECT l.l_returnflag, ABS(l_extendedprice - m) AS adev, m
        |  FROM lineitem l JOIN med USING (l_returnflag)),
        |mad AS (
        |  SELECT l_returnflag, ROUND(quantile_cont(adev, 0.5), 4) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.l_returnflag AS l_returnflag, COUNT(*) AS n, m AS median, mad,
        |  CAST(SUM(CASE WHEN adev > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_robust_outliers
        |FROM dev JOIN mad USING (l_returnflag)
        |GROUP BY 1, m, mad ORDER BY 1""".stripMargin,

    "dq_corr_matrix" ->
      """WITH st AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4))) AS s_q,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS ss_q,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS s_e,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS ss_e,
        |    SUM(CAST(l_discount AS DECIMAL(19,4))) AS s_d,
        |    SUM(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS ss_d,
        |    SUM(CAST(l_tax AS DECIMAL(19,4))) AS s_t,
        |    SUM(CAST(l_tax AS DECIMAL(19,4)) * CAST(l_tax AS DECIMAL(19,4))) AS ss_t,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS p_qe,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS p_qd,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_tax AS DECIMAL(19,4))) AS p_qt,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS p_ed,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_tax AS DECIMAL(19,4))) AS p_et,
        |    SUM(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_tax AS DECIMAL(19,4))) AS p_dt
        |  FROM lineitem),
        |pairs AS (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n, p_qe AS p,
        |    s_q AS sa, ss_q AS ssa, s_e AS sb, ss_e AS ssb FROM st
        |  UNION ALL SELECT 'l_quantity', 'l_discount', n, p_qd, s_q, ss_q, s_d, ss_d FROM st
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n, p_qt, s_q, ss_q, s_t, ss_t FROM st
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', n, p_ed, s_e, ss_e, s_d, ss_d FROM st
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n, p_et, s_e, ss_e, s_t, ss_t FROM st
        |  UNION ALL SELECT 'l_discount', 'l_tax', n, p_dt, s_d, ss_d, s_t, ss_t FROM st)
        |SELECT col_a, col_b, n,
        |  CASE WHEN (n * CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |          * (n * CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) <= 0
        |    THEN NULL
        |    ELSE ROUND((n * CAST(p AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / SQRT((n * CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |           * (n * CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
        |  END AS corr
        |FROM pairs ORDER BY col_a, col_b""".stripMargin,

    "dq_xicor" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, day,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY sv
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY sv DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nn
        |  FROM daily),
        |dd AS (
        |  SELECT event_type, nn, l,
        |    ABS(LEAD(r) OVER (PARTITION BY event_type ORDER BY day) - r) AS dr
        |  FROM rk)
        |SELECT event_type, CAST(MAX(nn) AS BIGINT) AS n_obs,
        |  CASE WHEN SUM(l * (nn - l)) = 0 THEN NULL
        |    ELSE ROUND(1.0 - CAST(MAX(nn) * SUM(dr) AS DOUBLE)
        |      / CAST(SUM(l * (nn - l)) * 2 AS DOUBLE), 6) END AS xi
        |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin,

    "dq_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type, isodow(CAST(ts AS TIMESTAMP)) - 1 AS dow,
        |    COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT o, event_type, dow,
        |    SUM(o) OVER (PARTITION BY event_type) AS row_t,
        |    SUM(o) OVER (PARTITION BY dow) AS col_t,
        |    SUM(o) OVER () AS nt
        |  FROM cells),
        |cc AS (
        |  SELECT o, event_type, dow,
        |    CAST(ROUND((o - CAST(row_t AS DOUBLE) * col_t / nt)
        |      * (o - CAST(row_t AS DOUBLE) * col_t / nt)
        |      / (CAST(row_t AS DOUBLE) * col_t / nt), 6) AS DECIMAL(28,6)) AS contrib
        |  FROM m)
        |SELECT CAST(SUM(o) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS chi2,
        |  (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT dow) - 1) AS dof,
        |  ROUND(SQRT(CAST(SUM(contrib) AS DOUBLE)
        |    / (CAST(SUM(o) AS DOUBLE)
        |      * LEAST(COUNT(DISTINCT event_type) - 1, COUNT(DISTINCT dow) - 1))), 6)
        |    AS cramers_v
        |FROM cc""".stripMargin,

    "dq_chisq" ->
      """WITH cells AS (
        |  SELECT event_type, isodow(CAST(ts AS TIMESTAMP)) - 1 AS dow,
        |    COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, dow, o,
        |    SUM(o) OVER (PARTITION BY event_type) AS row_t,
        |    SUM(o) OVER (PARTITION BY dow) AS col_t,
        |    SUM(o) OVER () AS n
        |  FROM cells)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, o,
        |  ROUND(CAST(row_t AS DOUBLE) * col_t / n, 4) AS expected,
        |  ROUND((o - CAST(row_t AS DOUBLE) * col_t / n)
        |    * (o - CAST(row_t AS DOUBLE) * col_t / n)
        |    / (CAST(row_t AS DOUBLE) * col_t / n), 6) AS contrib
        |FROM m ORDER BY event_type, dow""".stripMargin,

    "dq_ks" ->
      """WITH v AS (
        |  SELECT o_totalprice AS val,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS s1,
        |    CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS s2
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |agg AS (SELECT val, SUM(s1) AS c1, SUM(s2) AS c2 FROM v GROUP BY 1),
        |tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM agg),
        |cum AS (
        |  SELECT val,
        |    SUM(c1) OVER (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
        |    SUM(c2) OVER (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
        |  FROM agg),
        |sc AS (
        |  SELECT val, ABS(CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1) AS num
        |  FROM cum CROSS JOIN tot)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  ROUND(CAST(MAX(num) AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d_stat,
        |  ROUND(MIN(val) FILTER (WHERE num = (SELECT MAX(num) FROM sc)), 2) AS at_value
        |FROM sc CROSS JOIN tot GROUP BY n1, n2""".stripMargin,

    "dq_sequence_gaps" ->
      """SELECT id AS after_id, next - id - 1 AS gap_len FROM (
        |  SELECT o_orderkey AS id,
        |    LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS next
        |  FROM orders WHERE o_orderstatus = 'O') t
        |WHERE next - id > 1 ORDER BY after_id""".stripMargin,

    "dq_benford" ->
      """WITH c AS (
        |  SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
        |    COUNT(*) AS n
        |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share,
        |  ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected,
        |  ROUND(ABS(ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6)
        |    - ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
        |FROM c ORDER BY digit""".stripMargin,

    "dq_outliers" ->
      """WITH f AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.25) AS q1,
        |    quantile_cont(l_extendedprice, 0.75) AS q3
        |  FROM lineitem GROUP BY 1),
        |fen AS (
        |  SELECT l_returnflag, q1 - (q3 - q1) * 1.5 AS lo_fence,
        |    q3 + (q3 - q1) * 1.5 AS hi_fence
        |  FROM f)
        |SELECT l.l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_extendedprice < lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN l_extendedprice > hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  ROUND(MIN(lo_fence), 4) AS lo_fence,
        |  ROUND(MIN(hi_fence), 4) AS hi_fence
        |FROM lineitem l JOIN fen USING (l_returnflag)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "dq_skew" ->
      """WITH counts AS (SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM counts),
        |top AS (SELECT * FROM counts ORDER BY cnt DESC, key LIMIT 10)
        |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk, key, cnt,
        |  ROUND(CAST(cnt AS DOUBLE) / total, 6) AS share,
        |  ROUND(CAST(cnt AS DOUBLE) * n_keys / total, 4) AS x_mean
        |FROM top, tot ORDER BY rk""".stripMargin,

    "dq_histogram" ->
      """WITH b AS (
        |  SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
        |         CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
        |  FROM lineitem)
        |SELECT LEAST(CAST(floor((l_extendedprice - lo) * 20.0 / (hi - lo)) AS BIGINT), 19) AS bin,
        |  COUNT(*) AS n,
        |  ROUND(MIN(l_extendedprice), 2) AS min_v,
        |  ROUND(MAX(l_extendedprice), 2) AS max_v
        |FROM lineitem, b
        |WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY bin""".stripMargin,

    "dq_profile" -> {
      // mirror of canonStat: BIGINT/VARCHAR plain, DOUBLE via
      // DECIMAL(12,2), TIMESTAMP via epoch_us
      def branch(c: String, mn: String, mx: String) =
        s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $mn AS min_val, $mx AS max_val FROM orders""".stripMargin
      Seq(
        branch("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)", "CAST(MAX(o_orderkey) AS VARCHAR)"),
        branch("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)", "CAST(MAX(o_custkey) AS VARCHAR)"),
        branch("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
        branch("o_totalprice",
          "CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)",
          "CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)"),
        branch("o_orderdate",
          "CAST(epoch_us(CAST(MIN(o_orderdate) AS TIMESTAMP)) AS VARCHAR)",
          "CAST(epoch_us(CAST(MAX(o_orderdate) AS TIMESTAMP)) AS VARCHAR)"),
        branch("o_orderpriority", "MIN(o_orderpriority)", "MAX(o_orderpriority)")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "dq_unique" -> {
      def branch(name: String, table: String, keys: String) =
        s"""SELECT '$name' AS table_key,
           |  CAST(SUM(CASE WHEN __n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
           |  CAST(SUM(CASE WHEN __n > 1 THEN __n ELSE 0 END) AS BIGINT) AS n_dup_rows,
           |  MAX(__n) AS max_multiplicity
           |FROM (SELECT COUNT(*) AS __n FROM $table GROUP BY $keys) g""".stripMargin
      Seq(
        branch("orders:o_orderkey", "orders", "o_orderkey"),
        branch("customer:c_custkey", "customer", "c_custkey"),
        branch("lineitem:l_orderkey+l_linenumber", "lineitem", "l_orderkey, l_linenumber"),
        branch("documents:doc_id", "documents", "doc_id"),
        branch("documents:text_hash",
          "(SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS text_hash FROM documents)",
          "text_hash")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY table_key")
    },

    "dq_refint" -> {
      def branch(name: String, child: String, fk: String, parent: String, pk: String) =
        s"""SELECT '$name' AS relationship,
           |  (SELECT COUNT(*) FROM $child) AS n_child_rows,
           |  COUNT(*) AS n_orphans,
           |  CAST(COUNT(DISTINCT $fk) AS BIGINT) AS n_orphan_keys,
           |  (SELECT COUNT(*) - COUNT($fk) FROM $child) AS n_null_fk
           |FROM $child c WHERE $fk IS NOT NULL
           |  AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)""".stripMargin
      Seq(
        branch("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        branch("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        branch("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        branch("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        branch("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
    },

    "dq_drift" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS category, COUNT(*) AS n_base
        |  FROM orders WHERE o_orderdate < '1998-01-01' GROUP BY 1),
        |c AS (
        |  SELECT o_orderpriority AS category, COUNT(*) AS n_curr
        |  FROM orders WHERE o_orderdate >= '1998-01-01' GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(b.category, c.category) AS category,
        |    COALESCE(n_base, 0) AS n_base, COALESCE(n_curr, 0) AS n_curr
        |  FROM b FULL OUTER JOIN c ON b.category = c.category),
        |sh AS (
        |  SELECT category, n_base, n_curr,
        |    ROUND(CAST(n_base AS DOUBLE) / SUM(n_base) OVER (), 6) AS share_base,
        |    ROUND(CAST(n_curr AS DOUBLE) / SUM(n_curr) OVER (), 6) AS share_curr
        |  FROM j)
        |SELECT category, n_base, n_curr, share_base, share_curr,
        |  ROUND(CASE WHEN share_base > 0
        |    THEN (share_curr - share_base) * (share_curr - share_base) / share_base
        |    END, 6) AS chi2_contrib,
        |  ROUND(CASE WHEN share_base > 0 AND share_curr > 0
        |    THEN (share_curr - share_base) * ln(share_curr / share_base)
        |    END, 6) AS psi_contrib
        |FROM sh ORDER BY category""".stripMargin,

    "dq_entropy" -> {
      def branch(label: String, table: String, c: String) =
        s"""SELECT '$label' AS col_name, n_distinct,
           |  CAST(n_rows AS BIGINT) AS n_rows,
           |  ROUND(ent, 6) AS entropy_nats,
           |  ROUND(CASE WHEN n_distinct > 1
           |    THEN ent / ln(CAST(n_distinct AS DOUBLE)) END, 6) AS entropy_norm,
           |  ROUND(gini_raw, 6) AS gini
           |FROM (
           |  SELECT COUNT(*) AS n_distinct, MAX(t.t) AS n_rows,
           |    -SUM((CAST(n AS DOUBLE) / t.t) * ln(CAST(n AS DOUBLE) / t.t)) AS ent,
           |    1.0 - SUM((CAST(n AS DOUBLE) / t.t) * (CAST(n AS DOUBLE) / t.t)) AS gini_raw
           |  FROM (SELECT $c AS v, COUNT(*) AS n FROM $table
           |        WHERE $c IS NOT NULL GROUP BY 1) cnt
           |    CROSS JOIN (SELECT SUM(n) AS t FROM (SELECT COUNT(*) AS n FROM $table
           |        WHERE $c IS NOT NULL GROUP BY $c)) t
           |)""".stripMargin
      Seq(
        branch("documents.lang", "documents", "lang"),
        branch("documents.source", "documents", "source"),
        branch("events.event_type", "events", "event_type"),
        branch("orders.o_orderpriority", "orders", "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "dq_mutual_info" -> {
      def branch(label: String, table: String, x: String, y: String) = {
        val flt = s"$x IS NOT NULL AND $y IS NOT NULL"
        s"""SELECT '$label' AS pair, CAST(n_rows AS BIGINT) AS n_rows, n_cells,
           |  ROUND(mi, 6) AS mi_nats,
           |  ROUND(CASE WHEN hx + hy > 0 THEN 2.0 * mi / (hx + hy) END, 6) AS nmi
           |FROM (
           |  SELECT COUNT(*) AS n_cells, MAX(t.t) AS n_rows,
           |    SUM((CAST(c.n AS DOUBLE) / t.t) * ln((CAST(c.n AS DOUBLE) / t.t)
           |      / ((CAST(mx.nx AS DOUBLE) / t.t) * (CAST(my.ny AS DOUBLE) / t.t)))) AS mi
           |  FROM (SELECT $x AS vx, $y AS vy, COUNT(*) AS n FROM $table
           |        WHERE $flt GROUP BY 1, 2) c
           |  JOIN (SELECT $x AS vx, COUNT(*) AS nx FROM $table
           |        WHERE $flt GROUP BY 1) mx ON c.vx = mx.vx
           |  JOIN (SELECT $y AS vy, COUNT(*) AS ny FROM $table
           |        WHERE $flt GROUP BY 1) my ON c.vy = my.vy
           |  CROSS JOIN (SELECT COUNT(*) AS t FROM $table WHERE $flt) t)
           |CROSS JOIN (
           |  SELECT -SUM((CAST(nx AS DOUBLE) / t.t) * ln(CAST(nx AS DOUBLE) / t.t)) AS hx
           |  FROM (SELECT $x, COUNT(*) AS nx FROM $table WHERE $flt GROUP BY 1)
           |  CROSS JOIN (SELECT COUNT(*) AS t FROM $table WHERE $flt) t)
           |CROSS JOIN (
           |  SELECT -SUM((CAST(ny AS DOUBLE) / t.t) * ln(CAST(ny AS DOUBLE) / t.t)) AS hy
           |  FROM (SELECT $y, COUNT(*) AS ny FROM $table WHERE $flt GROUP BY 1)
           |  CROSS JOIN (SELECT COUNT(*) AS t FROM $table WHERE $flt) t)""".stripMargin
      }
      Seq(
        branch("lineitem.flag~status", "lineitem", "l_returnflag", "l_linestatus"),
        branch("orders.priority~status", "orders", "o_orderpriority", "o_orderstatus"),
        branch("documents.lang~source", "documents", "lang", "source"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY pair")
    },

    "dq_funcdep" -> {
      def branch(label: String, table: String, lhs: String, rhs: String) =
        s"""SELECT '$label' AS fd, COUNT(*) AS n_lhs,
           |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
           |  CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs
           |FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS n_rhs FROM $table
           |      WHERE $lhs IS NOT NULL GROUP BY 1)""".stripMargin
      Seq(
        branch("nation.n_nationkey->n_regionkey", "nation", "n_nationkey", "n_regionkey"),
        branch("part.p_brand->p_type", "part", "p_brand", "p_type"),
        branch("customer.c_nationkey->c_mktsegment", "customer",
          "c_nationkey", "c_mktsegment"),
        branch("orders.o_custkey->o_orderpriority", "orders",
          "o_custkey", "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },

    "dq_rules" -> {
      def branch(name: String, from: String, viol: String) =
        s"""SELECT '$name' AS rule, COUNT(*) AS n_checked,
           |  CAST(SUM(CASE WHEN $viol THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           |FROM $from""".stripMargin
      Seq(
        branch("lineitem.quantity_in_1_50", "lineitem",
          "l_quantity < 1 OR l_quantity > 50"),
        branch("lineitem.discount_in_0_0.2", "lineitem",
          "l_discount < 0 OR l_discount > 0.2"),
        branch("lineitem.price_positive", "lineitem", "l_extendedprice <= 0"),
        branch("orders.totalprice_positive", "orders", "o_totalprice <= 0"),
        branch("lineitem.ship_after_order",
          "(SELECT l_shipdate, o_orderdate FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
          "l_shipdate < o_orderdate")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY rule")
    }
  )
}
