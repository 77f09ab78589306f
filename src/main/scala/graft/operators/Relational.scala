package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Fx._
import graft.sources.Tables

/** The relational query core (SURVEY §2 group 1).
  *
  * Every query is a declarative DataFrame plan — Catalyst does
  * pushdown/pruning/join-reorder; AQE picks broadcast vs shuffle join
  * at runtime from actual sizes. Tiny dimensions (region, nation) are
  * explicitly `broadcast()`-hinted since they stay tiny at any scale
  * factor; everything else is left to AQE so the same code is right at
  * sf0.001 and at 100 TB.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(decM(col("l_quantity"))).cast(DoubleType), 2).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("sum_disc_price"),
          round(sum(decM(col("l_quantity"))).cast(DoubleType) / count(lit(1)), 4).as("avg_qty"),
          moneyAvg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_topk" -> { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    },

    "q5_multijoin" -> { (s, d) =>
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      Tables.customer(s, d)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    "q6_filter" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(round(sum(decM(col("l_extendedprice")) * decR(col("l_discount"))).cast(DoubleType), 2).as("revenue"))
    },

    "q_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    "q_distinct" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },

    "q_window_rank" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    },

    "q_window_running" -> { (s, d) =>
      // Global running aggregates WITHOUT an unpartitioned window at
      // any level — the single-partition WindowExec the naive plan
      // produces is the classic 100 TB bottleneck. Shape:
      //   cumsum  = year-partitioned cumsum + broadcast offset of all
      //             prior years' totals (triangular join over the tiny
      //             per-year aggregate);
      //   ma7     = trailing-7-CALENDAR-day mean via bounded fan-out
      //             (each day contributes to exactly 7 target days)
      //             and re-aggregation — a shuffle, not a window.
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(decV(col("value"))).as("daily_dec"), count(lit(1)).as("n_events"))
      val wy = Window.partitionBy(year(col("d"))).orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totals = daily.groupBy(year(col("d")).as("y")).agg(sum("daily_dec").as("ytot"))
      val prior = totals.select(col("y").as("py"), col("ytot").as("ptot"))
      val offsets = totals.select("y").join(prior, col("py") < col("y"))
        .groupBy("y").agg(sum("ptot").as("y_offset"))
      // projection barrier before the generator (see Dedup.docShingles)
      val fan = daily
        .select(col("daily_dec").as("f_dec"),
          sequence(col("d"), col("d") + expr("INTERVAL 6 DAYS"), expr("INTERVAL 1 DAY")).as("ds"))
        .select(col("f_dec"), explode(col("ds")).as("td"))
      val ma = fan.groupBy("td").agg(sum("f_dec").as("ma7_dec"), count(lit(1)).as("n7"))
      daily
        .withColumn("ycum", sum(col("daily_dec")).over(wy))
        .join(broadcast(offsets), year(col("d")) === col("y"), "left")
        .join(ma, col("d") === col("td"))
        .select(
          col("d"),
          round(col("daily_dec").cast(DoubleType), 4).as("daily"),
          col("n_events"),
          round((col("ycum") + coalesce(col("y_offset"), lit(0))).cast(DoubleType), 4).as("cum_value"),
          round(col("ma7_dec").cast(DoubleType) / col("n7"), 4).as("ma7"))
        .orderBy("d")
    },

    "q_semijoin" -> { (s, d) =>
      val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      Tables.customer(s, d)
        .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    "q_antijoin" -> { (s, d) =>
      // Customers with no recent order — non-empty at every SF.
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("2000-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q_union" -> { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 200000).select("o_orderpriority")
        .unionAll(o.filter(col("o_orderdate") >= lit("2000-01-01")).select("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    "q_scalar_subquery" -> { (s, d) =>
      val p = Tables.part(s, d)
      val thr = p.agg((sum(decM(col("p_retailprice"))).cast(DoubleType) / count(lit(1))).as("thr"))
      p.crossJoin(broadcast(thr))
        .filter(col("p_retailprice") > col("thr"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), moneyAvg(col("p_retailprice")).as("avg_price"))
        .orderBy("p_brand")
    },

    "q_rollup" -> { (s, d) =>
      // Expressed through the SQL surface: rollup output columns shadow
      // join inputs and trip the DataFrame analyzer's ambiguity check;
      // the SQL path resolves them by position. Identical logical plan.
      Tables.customer(s, d).createOrReplaceTempView("graft_customer")
      Tables.nation(s, d).createOrReplaceTempView("graft_nation")
      Tables.region(s, d).createOrReplaceTempView("graft_region")
      s.sql(
        """SELECT r_name, n_name, COUNT(*) AS n_cust,
          |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_bal
          |FROM graft_customer
          |  JOIN graft_nation ON c_nationkey = n_nationkey
          |  JOIN graft_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },

    "q_pivot" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_fulfilled"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_pending"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    "q_having" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")
    },

    "q_minsub" -> { (s, d) =>
      // Parts priced at their brand's minimum (correlated-min subquery
      // shape, decorrelated to an aggregate + equi-join).
      val p = Tables.part(s, d)
      val mins = p.groupBy(col("p_brand").as("mb")).agg(min(col("p_retailprice")).as("min_price"))
      p.join(broadcast(mins), col("p_brand") === col("mb") && col("p_retailprice") === col("min_price"))
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    },

    "q_percentile" -> { (s, d) =>
      // Exact interpolated percentiles (median / p90) per return flag —
      // via the bounded-memory two-pass selection (Percentiles), not
      // the built-in percentile() whose reducer buffers every group
      // value. Identical q*(n-1) interpolation semantics (spec-proven).
      Percentiles.exactQuantiles(Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
          Seq("median_price" -> 0.5, "p90_price" -> 0.9))
        .select(col("l_returnflag"),
          round(col("median_price"), 4).as("median_price"),
          round(col("p90_price"), 4).as("p90_price"), col("n"))
        .orderBy("l_returnflag")
    },

    "q7_volume" -> { (s, d) =>
      // Shipping volume between two nations, per direction and year.
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      Tables.supplier(s, d)
        .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8")
          || (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    "q10_returns" -> { (s, d) =>
      // Top customers by returned revenue in a half-year window.
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-07-01")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    },

    "q14_promo" -> { (s, d) =>
      // Promo revenue share per month (conditional agg over a join).
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
        .agg(
          round(lit(100.0) * sum(when(col("p_type") === "PROMO",
              revenue(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0).cast("decimal(17,4)")))
            .cast(DoubleType)
            / sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 4)
            .as("promo_share"),
          count(lit(1)).as("n"))
        .orderBy("month")
    },

    "q_approx" -> { (s, d) =>
      // Sketch aggregates (rows-only check: approximate by design).
      // At 100 TB these replace exact distinct/percentile shuffles with
      // mergeable fixed-size sketches — one narrow pass.
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    "q_approx_gate" -> { (s, d) =>
      // HASH-CHECKED accuracy gate behind q_approx's rows-only check:
      // per group, the sketch answers must sit within stated error of
      // the exact ones — approx_count_distinct (HLL++, rsd 0.01 → 5%
      // headroom is generous) and percentile_approx at accuracy 2500
      // (rank error n/2500 → 1% value headroom on this distribution).
      // DuckDB asserts the booleans, so a silently degraded sketch
      // hash-fails CORRECTNESS instead of hiding behind "approximate
      // by design". PLAN SHAPE (the lesson this query earned twice):
      // the sketch aggregates, the exact distinct, and the exact
      // median each run in their OWN pass and join on the tiny group
      // frame. Fused, they poison each other — count_distinct plans
      // an Expand that doubles every row AND each expanded row then
      // pays the HLL++/KLL sketch update (measured 19 s for the pair
      // alone), and an in-pass exact percentile() buffers every group
      // value on the object/sort path (the full fusion measured 101 s
      // at sf0.1; the three split passes total ~5 s — same story at
      // 100 TB, where the Expand would double the shuffle).
      val li = Tables.lineitem(s, d)
      val sketch = li.groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("__ad"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(2500)).as("__am"))
      val exactCd = li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_orderkey")).as("__ed"))
      val exact = Percentiles.exactQuantiles(
        li, "l_returnflag", "l_extendedprice", Seq("__em" -> 0.5))
      sketch.join(exactCd, Seq("l_returnflag"))
        .join(broadcast(exact), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (abs(col("__ad") - col("__ed")).cast("double") / col("__ed") <= 0.05)
            .as("distinct_ok"),
          (abs(col("__am") - col("__em")) / col("__em") <= 0.01).as("median_ok"))
        .orderBy("l_returnflag")
    },

    "q4_priority" -> { (s, d) =>
      // TPC-H Q4 shape: EXISTS → left-semi (never join+distinct, which
      // would fan out before deduplicating).
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01") && col("o_orderdate") < lit("1997-01-01"))
      val returned = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    "q8_mktshare" -> { (s, d) =>
      // TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold
      // into AMERICA, per order year. Two independent nation dimension
      // joins (customer side, supplier side) — both broadcast.
      val cn = Tables.nation(s, d).select(col("n_nationkey").as("cnk"), col("n_regionkey").as("crk"))
      val sn = Tables.nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      val amer = Tables.region(s, d).filter(col("r_name") === "AMERICA")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cnk"))
        .join(broadcast(amer), col("crk") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3",
              revenue(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0).cast("decimal(17,4)")))
            .cast(DoubleType)
          / sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    "q9_profit" -> { (s, d) =>
      // TPC-H Q9 shape: profit on 'widget' parts per supplier nation
      // and order year (string-contains filter reaches the part scan).
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("widget")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    "q13_custdist" -> { (s, d) =>
      // TPC-H Q13: order-count distribution over ALL customers — the
      // left outer join keeps zero-order customers in the histogram.
      val ord = Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
      Tables.customer(s, d)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    "q15_topsupp" -> { (s, d) =>
      // TPC-H Q15: top supplier(s) by quarterly revenue — argmax via
      // broadcast scalar max, compared on EXACT decimals (rounding to
      // double before the equality would be engine-dependent).
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev_dec"))
      val mx = rev.agg(max(col("rev_dec")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_dec") === col("mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("rev_dec").cast(DoubleType), 2).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    "q16_suppcnt" -> { (s, d) =>
      // TPC-H Q16 shape: distinct supplier count per part attribute,
      // excluding flagged suppliers (NOT IN → left-anti on a tiny set).
      val p = Tables.part(s, d).filter(col("p_brand") =!= "Brand#1"
        && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      val flagged = Tables.supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    "q17_smallqty" -> { (s, d) =>
      // TPC-H Q17 shape: revenue from orders below half the part's
      // average quantity. The correlated avg decorrelates to one
      // aggregate + equi-join; the half-average comparison is kept in
      // EXACT integer-decimal cross-multiplied form (qty*2*cnt < sum) —
      // a float avg*0.5 boundary would be engine-dependent.
      val partAgg = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(decM(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") === "Brand#3"),
          col("l_partkey") === col("p_partkey"))
        .join(partAgg, col("l_partkey") === col("pk"))
        .filter(decM(col("l_quantity")) * lit(2) * col("cnt") < col("sum_qty"))
        .agg(round(sum(decM(col("l_extendedprice"))).cast(DoubleType) / 7, 4).as("avg_yearly"))
    },

    "q18_large" -> { (s, d) =>
      // TPC-H Q18: large-quantity orders — HAVING on an order-level
      // aggregate, then joined back to orders + customer.
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(decM(col("l_quantity"))).as("sum_qty_dec"))
        .filter(col("sum_qty_dec") > 150)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), round(col("sum_qty_dec").cast(DoubleType), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    "q19_disjunct" -> { (s, d) =>
      // TPC-H Q19: disjunctive bracket predicates across the join —
      // Catalyst extracts the common p_brand/p_size conjuncts for scan
      // pushdown; the residual OR evaluates post-join.
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
        .agg(round(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast(DoubleType), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    "q22_balance" -> { (s, d) =>
      // TPC-H Q22 shape: above-average-balance customers with no
      // recent orders, per nation. The scalar average is compared by
      // exact decimal cross-multiplication (bal*cnt > sum), not a
      // floating-point avg.
      val pos = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("cnt"), sum(decM(col("c_acctbal"))).as("sum_bal"))
      Tables.customer(s, d)
        .crossJoin(broadcast(pos))
        .filter(decM(col("c_acctbal")) * col("cnt") > col("sum_bal"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("2000-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    },

    "q_cube" -> { (s, d) =>
      // Full CUBE over status × priority (see q_rollup on why this
      // goes through the SQL surface).
      Tables.orders(s, d).createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
          |FROM graft_orders
          |GROUP BY CUBE(o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    "q_json" -> { (s, d) =>
      // Semi-structured extraction (the lake's JSON-column class):
      // a deterministic JSON payload is built with plain concat (NOT
      // to_json — engines disagree on float/space rendering), then
      // fields come back out through the JSON parser (get_json_object)
      // and aggregate. Proves the parse path end-to-end cross-engine;
      // extraction is a narrow codegen'd projection.
      val payload = concat(lit("{\"k\":"), col("o_orderkey"),
        lit(",\"p\":\""), col("o_orderpriority"), lit("\",\"s\":\""),
        col("o_orderstatus"), lit("\"}"))
      Tables.orders(s, d)
        .select(payload.as("js"))
        // from_json with an explicit schema: ONE parse per row (three
        // get_json_object calls each re-parsed the payload — 3× the
        // dominant kernel cost of this query for identical output).
        .select(from_json(col("js"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG, p STRING, s STRING")).as("o"))
        .select(col("o.p").as("priority"), col("o.s").as("status"), col("o.k").as("k"))
        .groupBy("priority", "status")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("priority", "status")
    },

    "q_stragg" -> { (s, d) =>
      // String aggregation (LISTAGG/STRING_AGG shape): per order
      // status, the DISTINCT priorities joined in sorted order —
      // collect_set is order-nondeterministic across partitions, so
      // array_sort pins the rendering before concat_ws; the group's
      // value set is small and bounded (an enum), which is the only
      // place collect_set belongs at 100 TB.
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(concat_ws("|", array_sort(collect_set(col("o_orderpriority"))))
          .as("priorities"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    "q_mode" -> { (s, d) =>
      // Modal value per group (most frequent priority per order
      // status) with a deterministic tie-break — the `mode()`
      // statistical aggregate, decomposed into a combinable count
      // frame + a row_number() = 1 filter the graft rule rewrites to
      // TopKPerKeyExec (k=1 heap per group, no per-group sort).
      val counts = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("cnt"))
        .orderBy("o_orderstatus")
    },

    "q_corr" -> { (s, d) =>
      // Correlation + least-squares regression of extended price on
      // quantity per return flag — the stats-aggregate family (corr /
      // covar / regr_slope) WITHOUT the engine's float aggregates:
      // built-in corr() folds doubles in partition order, so its last
      // bits depend on the split. Here every sufficient statistic
      // (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT decimal sum — order-
      // independent, map-side combinable, one hash aggregate — and the
      // float math runs once per GROUP at the output boundary, written
      // token-identically in the oracle.
      // Precisions chosen so every PRODUCT stays ≤ 18 digits and the
      // whole sufficient-statistic pass runs on long-backed decimals:
      // (6,2)·(8,2) → (15,4), (8,2)² → (17,4). decM's (12,2) pushed
      // the products to precision 25 — the BigDecimal slow path, ~4×
      // the kernel cost for identical exact values (quantity < 10⁴,
      // price < 10⁶ hold by the schema's domain; widen if yours don't).
      val x = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(6, 2))
      val y = col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(8, 2))
      val agg = Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"), sum(x * y).as("__sxy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
      val n = col("n").cast(DoubleType)
      val Seq(sx, sy, sxy, sxx, syy) =
        Seq("__sx", "__sy", "__sxy", "__sxx", "__syy").map(col(_).cast(DoubleType))
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      agg.select(col("l_returnflag"), col("n"),
        round((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_xy"),
        round(slope, 6).as("slope"),
        round((sy - slope * sx) / n, 6).as("intercept"))
        .orderBy("l_returnflag")
    },

    "q_first_last" -> { (s, d) =>
      // first_value / nth_value over a full-partition frame: per
      // segment, the richest customer, the poorest, and the runner-up —
      // frame must be UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING (the
      // default stops at CURRENT ROW and nth/last would be wrong).
      // One row per segment via a distinct after the window pass.
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .withColumn("richest", first(col("c_name")).over(w))
        .withColumn("runner_up", nth_value(col("c_name"), 2).over(w))
        .withColumn("poorest", last(col("c_name")).over(w))
        .select("c_mktsegment", "richest", "runner_up", "poorest")
        .distinct()
        .orderBy("c_mktsegment")
    },

    "q_intersect" -> { (s, d) =>
      // INTERSECT: customers active in BOTH eras. Plans as a distinct +
      // left-semi join — the key set shuffles once per side.
      val ord = Tables.orders(s, d)
      val early = ord.filter(col("o_orderdate") < "1996-01-01").select("o_custkey")
      val late = ord.filter(col("o_orderdate") >= "2000-01-01").select("o_custkey")
      early.intersect(late).orderBy("o_custkey")
    },

    "q_except" -> { (s, d) =>
      // EXCEPT: customers who placed urgent orders but never low-
      // priority ones — distinct + left-anti join (cohort-difference
      // shape).
      val ord = Tables.orders(s, d)
      val urgent = ord.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val low = ord.filter(col("o_orderpriority") === "5-LOW").select("o_custkey")
      urgent.except(low).orderBy("o_custkey")
    },

    "q_ntile" -> { (s, d) =>
      // Quartile banding per segment (ntile window) + per-band
      // aggregates. Tie order pinned by (acctbal, custkey) so band
      // boundaries are engine-independent.
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("quartile", ntile(4).over(w).cast(LongType))
        .groupBy("c_mktsegment", "quartile")
        .agg(count(lit(1)).as("n"),
          round(min(decM(col("c_acctbal"))).cast(DoubleType), 2).as("min_bal"),
          round(max(decM(col("c_acctbal"))).cast(DoubleType), 2).as("max_bal"))
        .orderBy("c_mktsegment", "quartile")
    },

    "q_grouping_sets" -> { (s, d) =>
      // Arbitrary GROUPING SETS (neither a rollup prefix nor a full
      // cube): region-level totals, status-level totals, and the grand
      // total in ONE pass — Catalyst expands the sets with a single
      // Expand node over the joined input, so the fact side is read and
      // joined once, not once per set. Dimensions broadcast.
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      j.groupingSets(Seq(Seq(col("r_name")), Seq(col("o_orderstatus")), Seq()),
          col("r_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("r_name", "o_orderstatus")
    },

    "q11_share" -> { (s, d) =>
      // TPC-H Q11 shape (no partsupp table in this lake — "stock
      // value" is shipped value per part from NATION_1's suppliers):
      // group aggregate filtered against a share of the global sum.
      // The share test is exact-decimal cross-multiplied (value*1000 >
      // total), never a float fraction.
      val n1supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_19")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val vals = Tables.lineitem(s, d)
        .join(broadcast(n1supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(decM(col("l_extendedprice"))).as("value_dec"))
      val total = vals.agg(sum(col("value_dec")).as("total_dec"))
      vals.crossJoin(broadcast(total))
        .filter(col("value_dec") * lit(1000) > col("total_dec"))
        .select(col("l_partkey"), round(col("value_dec").cast(DoubleType), 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },

    "q12_priority" -> { (s, d) =>
      // TPC-H Q12 shape (l_linestatus stands in for shipmode; "late"
      // is shipped > 60 days after order date): per-group conditional
      // priority counts over an orders⋈lineitem join with a
      // cross-column timestamp predicate.
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d)
            .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    "q20_excess" -> { (s, d) =>
      // TPC-H Q20 shape: suppliers in NATION_2 who shipped a large
      // quantity of widget parts in 1996 — a HAVING-filtered aggregate
      // driving a semi-join into the supplier dimension.
      val widgetQty = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
        .join(Tables.part(s, d).filter(col("p_name").contains("widget")).select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(sum(decM(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 50)
        .select("l_suppkey")
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_8")),
          col("s_nationkey") === col("n_nationkey"))
        .join(widgetQty, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    "q21_waiting" -> { (s, d) =>
      // TPC-H Q21 shape (l_returnflag='R' stands in for "late"):
      // suppliers whose item was the ONLY returned one on a
      // multi-supplier finalized order. The EXISTS/NOT-EXISTS double
      // correlation decorrelates to one per-order aggregate
      // (distinct-supplier counts) joined back — one shuffle on
      // orderkey instead of two correlated subquery scans.
      val fo = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select("o_orderkey")
      val base = Tables.lineitem(s, d)
        .join(fo, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val ordAgg = base.groupBy(col("l_orderkey").as("ok"))
        .agg(
          countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey"))).as("nsupp_r"))
      base.filter(col("l_returnflag") === "R")
        .join(ordAgg, col("l_orderkey") === col("ok"))
        .filter(col("nsupp") >= 2 && col("nsupp_r") === 1)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }
  )

  /** DuckDB oracles. Aliases and ORDER BY match the Spark plans
    * column-for-column; money math uses the same DECIMAL discipline so
    * hashes match bit-for-bit (SURVEY §4).
    */
  val oracles: Map[String, String] = Map(
    "q_approx_gate" ->
      """SELECT l_returnflag, TRUE AS distinct_ok, TRUE AS median_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      """SELECT n_name,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_filter" ->
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_window_running" ->
      """SELECT d,
        |  ROUND(CAST(daily_dec AS DOUBLE), 4) AS daily,
        |  n_events,
        |  ROUND(CAST(SUM(daily_dec) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS cum_value,
        |  ROUND(CAST(SUM(daily_dec) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 4) AS ma7
        |FROM (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS daily_dec, COUNT(*) AS n_events
        |  FROM events GROUP BY 1) t
        |ORDER BY d""".stripMargin,

    "q_semijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_union" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
        |  UNION ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01') t
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price
        |FROM part
        |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM part)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
        |ORDER BY o_custkey""".stripMargin,

    "q_minsub" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part
        |WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand)
        |ORDER BY p_brand, p_partkey""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
        |FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, revenue, n_name FROM (
        |  SELECT c_custkey, c_name, n_name,
        |    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
        |  FROM customer
        |    JOIN orders ON c_custkey = o_custkey
        |    JOIN lineitem ON o_orderkey = l_orderkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        |    AND l_returnflag = 'R'
        |  GROUP BY c_custkey, c_name, n_name) t
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q14_promo" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
        |  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS promo_share,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY month ORDER BY month""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q8_mktshare" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1) t
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_topsupp" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, ROUND(CAST(rev_dec AS DOUBLE), 2) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_suppcnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_smallqty" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7, 4) AS avg_yearly
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN pa ON l_partkey = pk
        |WHERE p_brand = 'Brand#3'
        |  AND CAST(l_quantity AS DECIMAL(12,2)) * 2 * cnt < sum_qty""".stripMargin,

    "q18_large" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  ROUND(CAST(sum_qty_dec AS DOUBLE), 2) AS sum_qty
        |FROM orders
        |  JOIN big ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_disjunct" ->
      """SELECT
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_balance" ->
      """WITH t AS (
        |  SELECT COUNT(*) AS cnt, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS totacctbal
        |FROM customer, t
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_json" ->
      """WITH js AS (
        |  SELECT '{"k":' || o_orderkey || ',"p":"' || o_orderpriority
        |    || '","s":"' || o_orderstatus || '"}' AS payload
        |  FROM orders)
        |SELECT json_extract_string(payload, '$.p') AS priority,
        |  json_extract_string(payload, '$.s') AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(payload, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM js GROUP BY 1, 2 ORDER BY priority, status""".stripMargin,

    "q_stragg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_mode" ->
      """WITH counts AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority) AS rk
        |  FROM counts) t
        |WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    "q_corr" ->
      """WITH agg AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_xy,
        |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
        |  ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
        |    / CAST(n AS DOUBLE), 6) AS intercept
        |FROM agg ORDER BY l_returnflag""".stripMargin,

    "q_first_last" ->
      """SELECT DISTINCT c_mktsegment,
        |  FIRST_VALUE(c_name) OVER w AS richest,
        |  NTH_VALUE(c_name, 2) OVER w AS runner_up,
        |  LAST_VALUE(c_name) OVER w AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate < '1996-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= '2000-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,

    "q_ntile" ->
      """SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile, COUNT(*) AS n,
        |  ROUND(CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS min_bal,
        |  ROUND(CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS max_bal
        |FROM (
        |  SELECT c_mktsegment, c_acctbal,
        |    NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_grouping_sets" ->
      """SELECT r_name, o_orderstatus, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (o_orderstatus), ())
        |ORDER BY r_name, o_orderstatus""".stripMargin,

    "q11_share" ->
      """WITH vals AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_19')
        |  GROUP BY 1)
        |SELECT l_partkey, ROUND(CAST(value_dec AS DOUBLE), 2) AS value
        |FROM vals
        |WHERE value_dec * 1000 > (SELECT SUM(value_dec) FROM vals)
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q12_priority" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_excess" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_8'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |    GROUP BY 1
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |  JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin
  )
}
