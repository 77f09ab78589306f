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
      // Exact interpolated percentiles (median / p90) per return flag.
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          count(lit(1)).as("n"))
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
    }
  )

  /** DuckDB oracles. Aliases and ORDER BY match the Spark plans
    * column-for-column; money math uses the same DECIMAL discipline so
    * hashes match bit-for-bit (SURVEY §4).
    */
  val oracles: Map[String, String] = Map(
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
        |GROUP BY month ORDER BY month""".stripMargin
  )
}
