package graft.queries

import graft.{Q, Tables}
import graft.util.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational surface: scan/filter/project, aggregation, joins
  * (broadcast / shuffle / semi / anti), windows, sort/limit/top-k, set
  * ops, rollup/cube, distinct aggregates, scalar functions.
  *
  * The reference connector delegates all of this to Spark SQL over its
  * pushdown-capable scan (see SURVEY.md §2.3–§2.8; the reference's own
  * test query is `/root/reference/src/test/scala/ScalaDatasourceTest.scala:88-91`).
  * Here each capability is exercised as a named query over the driver
  * corpus with a DuckDB oracle.
  *
  * Scale notes (100 TB): every aggregation below is a partial/final hash
  * aggregate (map-side combine) on group-by keys; joins against dimension
  * tables are explicitly `broadcast()`; fact-fact joins shuffle on the
  * join key with AQE free to re-plan; filters and projections sit directly
  * on the parquet scan so pushdown + column pruning reach the reader.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  /** TPC-H Q1 shape: full-scan partial+final aggregate with exact
    * decimal sums (see Exact). */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    (s, d) => {
      val l = li(s, d).filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        ${sqlDavg("l_discount", 2)} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    doc = "full-scan hash aggregate, exact decimal sums")

  /** TPC-H Q6 shape: tight filter band → parquet PushedFilters, single
    * global aggregate. */
  val q2ForecastRevenue: Q = Q(
    "q2_forecast_revenue",
    (s, d) =>
      li(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_rows")),
    Some(s"""
      SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue,
             count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24"""),
    doc = "filter pushdown to parquet scan + global agg")

  /** TPC-H Q3 shape: 3-way join (dim broadcast, fact-fact shuffle),
    * group + top-k. */
  val q3ShippingPriority: Q = Q(
    "q3_shipping_priority",
    (s, d) => {
      val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = ord(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = li(s, d).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1997-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10"""),
    doc = "broadcast dim join + shuffle fact join + top-k")

  /** Star join: orders ⋈ customer ⋈ nation ⋈ region, all dims broadcast. */
  val q4StarJoin: Q = Q(
    "q4_star_join",
    (s, d) => {
      val o = ord(s, d)
      val c = cust(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""
      SELECT r_name, n_name, count(*) AS n_orders,
             ${sqlDsum("o_totalprice")} AS total_price
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""),
    doc = "star schema, all dimensions broadcast")

  /** Left-semi join = EXISTS. */
  val q5SemiJoin: Q = Q(
    "q5_semi_join",
    (s, d) => {
      // project to the join key BEFORE broadcasting: the semi join only
      // needs the key set, and the hint then ships ~1/10th the bytes
      val bigOrders = ord(s, d).filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey"))
      cust(s, d)
        .join(broadcast(bigOrders), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
             dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""
      SELECT c_mktsegment, count(*) AS n_customers,
             ${sqlDsum("c_acctbal")} AS sum_acctbal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    doc = "left_semi join (EXISTS)")

  /** Left-anti join = NOT EXISTS. The build side is restricted to
    * high-value orders (> 450k, ~ the 90th percentile) so that a
    * substantial subset of customers genuinely lacks a qualifying order —
    * an unrestricted build side matches every customer in this corpus and
    * the anti join would pass its oracle vacuously with 0 rows. */
  val q6AntiJoin: Q = Q(
    "q6_anti_join",
    (s, d) =>
      cust(s, d)
        .join(broadcast(ord(s, d)
            .filter(col("o_totalprice") > 450000.0)
            .select(col("o_custkey"))),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey")),
    Some("""
      SELECT c_nationkey, count(*) AS n_customers
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""),
    doc = "left_anti join (NOT EXISTS)")

  /** Ranking window: top-3 orders per customer. */
  val q7WindowTopN: Q = Q(
    "q7_window_topn",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""),
    doc = "row_number ranking window, per-group top-k")

  /** Running-total window with an exact decimal accumulator. */
  val q8RunningTotal: Q = Q(
    "q8_running_total",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li(s, d)
        .filter(col("l_suppkey") <= 5)
        .withColumn("running_qty",
          sum(fixedLong(col("l_quantity"))).over(w).cast("double") / 100.0)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                col("l_shipdate"), col("l_quantity"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    },
    Some(s"""
      SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        CAST(sum(${sqlFixedLong("l_quantity")}) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_qty
      FROM lineitem
      WHERE l_suppkey <= 5
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""),
    doc = "running-sum window frame")

  /** Analytic window functions: lag / lead / rank / dense_rank / ntile. */
  val q9WindowAnalytics: Q = Q(
    "q9_window_analytics",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d)
        .filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
        rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
      FROM orders
      WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderdate, o_orderkey"""),
    doc = "lag/lead/rank/ntile analytic windows")

  /** Global top-k (TakeOrderedAndProject). */
  val q10TopK: Q = Q(
    "q10_topk",
    (s, d) =>
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25),
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 25"""),
    doc = "global top-k → TakeOrderedAndProject, no full sort")

  /** Set ops: symmetric difference via UNION / INTERSECT / EXCEPT. */
  val q11SetOps: Q = Q(
    "q11_set_ops",
    (s, d) => {
      val a = cust(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
      val b = ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      a.union(b).distinct()
        .except(a.intersect(b))
        .orderBy(col("custkey"))
    },
    Some("""
      SELECT custkey FROM (
        (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
         UNION
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        EXCEPT
        (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'))
      ORDER BY custkey"""),
    doc = "UNION / INTERSECT / EXCEPT (symmetric difference)")

  /** ROLLUP hierarchy totals (keys coalesced to 'ALL' for a
    * null-ordering-proof compare). */
  val q12Rollup: Q = Q(
    "q12_rollup",
    (s, d) =>
      li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus")),
    Some(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""),
    doc = "ROLLUP grouping sets")

  /** CUBE over two order dimensions. */
  val q13Cube: Q = Q(
    "q13_cube",
    (s, d) =>
      ord(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority")),
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n, ${sqlDsum("o_totalprice")} AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""),
    doc = "CUBE grouping sets")

  /** Distinct aggregates (expand + two-phase agg in Spark). */
  val q14DistinctAgg: Q = Q(
    "q14_distinct_agg",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
    doc = "multi-column distinct aggregation")

  /** Scalar function coverage: string / math / conditional. */
  val q15ScalarFuncs: Q = Q(
    "q15_scalar_funcs",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          round(col("p_retailprice") * 1.1, 3).as("marked_up"),
          (col("p_size") % 5).as("size_mod"),
          abs(col("p_size") - 25).as("size_dist"),
          round(sqrt(col("p_size").cast("double")), 6).as("size_sqrt"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 5) AS prefix5,
             length(p_name) AS name_len,
             concat_ws('-', p_brand, p_type) AS brand_type,
             round(p_retailprice * 1.1, 3) AS marked_up,
             p_size % 5 AS size_mod,
             abs(p_size - 25) AS size_dist,
             round(sqrt(CAST(p_size AS DOUBLE)), 6) AS size_sqrt
      FROM part
      ORDER BY p_partkey"""),
    doc = "string/math scalar function parity")

  /** CASE / COALESCE / NULLIF conditional logic. */
  val q16CaseNull: Q = Q(
    "q16_case_null",
    (s, d) =>
      cust(s, d)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)")).as("seg"),
          signum(col("c_acctbal")).cast("int").as("bal_sign"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS bal_band,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg,
             CAST(sign(c_acctbal) AS INT) AS bal_sign
      FROM customer
      ORDER BY c_custkey"""),
    doc = "CASE/COALESCE/NULLIF")

  /** Typed Aggregator UDAF (graft.functions.WeightedAvg): quantity-
    * weighted average price per returnflag, summed in exact integer
    * cents so the oracle reproduces it bit-for-bit. */
  val q26UdafWavg: Q = Q(
    "q26_udaf_wavg",
    (s, d) => {
      val wavg = udaf(graft.functions.WeightedAvg)
      li(s, d)
        .withColumn("pc", fixedLong(col("l_extendedprice")))
        .withColumn("qc", fixedLong(col("l_quantity")))
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("pc"), col("qc")).as("wavg_price_per_qty"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) /
             CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
               AS wavg_price_per_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
    doc = "typed Aggregator UDAF (weighted average)")

  def defs: Seq[Q] = Seq(
    q1PricingSummary, q2ForecastRevenue, q3ShippingPriority, q4StarJoin,
    q5SemiJoin, q6AntiJoin, q7WindowTopN, q8RunningTotal, q9WindowAnalytics,
    q10TopK, q11SetOps, q12Rollup, q13Cube, q14DistinctAgg, q15ScalarFuncs,
    q16CaseNull, q26UdafWavg)
}
