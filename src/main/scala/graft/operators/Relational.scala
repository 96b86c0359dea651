package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Relational / star-schema analytics: TPC-H-style scan→filter→join→agg
  * pipelines over the driver's tables.
  *
  * Determinism discipline (oracle hash-parity with DuckDB): every monetary
  * double is cast to DECIMAL before aggregation — decimal sums are exact and
  * order-independent, so Spark's partial-agg + shuffle merge order and
  * DuckDB's parallel sum produce bit-identical results; the final value is
  * cast back to DOUBLE for a stable output schema. Ratios divide two
  * already-deterministic values in double space. Every query ends in a total
  * ORDER BY so row order is deterministic too.
  *
  * Scale discipline: filters sit directly on scans (pushed into parquet),
  * FIXED-SIZE dimension joins (nation: 25 rows, region: 5 — constant at
  * every sf) are `broadcast(...)`; sf-PROPORTIONAL tables (part, supplier,
  * customer, orders) are never force-broadcast — the planner's size
  * statistics plus AQE pick broadcast while a projected side is actually
  * small and degrade to shuffled joins when it isn't (a hard hint on a
  * table that grows with the corpus is an OOM at 100 TB). Aggregates run
  * partial→final.
  */
object Relational {

  /** Exact 2-dp decimal view of a money/rate double column. Precision 15 is
    * headroom; scale 2 matches the generated data exactly (verified: all
    * money columns are 2-dp). */
  private def dec(c: Column): Column = c.cast(DecimalType(15, 2))
  private def sumMoney(c: Column): Column = sum(dec(c)).cast("double")
  // Narrow casts for decimal *products*: DECIMAL multiply precision grows as
  // p1+p2+1, and DuckDB hard-errors past 38 digits, so prices use (12,2) and
  // rates (discount/tax, all < 10) use (3,2): a triple product lands at
  // (22,6) in Spark / (20,6) in DuckDB — same exact value, both within 38.
  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  private def rate(c: Column): Column = c.cast(DecimalType(3, 2))
  private def discounted(price: Column, disc: Column): Column =
    money(price) * (lit(1).cast(DecimalType(3, 2)) - rate(disc))

  /** TPC-H Q1: pricing summary report over lineitem. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    // Exact decimal aggregation via LONG-decomposed hundredths (r16, guide
    // §1.2 step 2): the decimal formulation paid two java.math.BigDecimal
    // multiplies (disc_price, charge) plus five decimal casts PER ROW —
    // 6.1 s at sf1 for a single-pass 4-group aggregation. Money and rate
    // columns are exact hundredths, so every product is a BIGINT in whole-
    // stage codegen: disc_u = pc·(100−dk) carries 10⁻⁴ units, chg_u =
    // disc_u·(100+tk) carries 10⁻⁶ units. The two product sums are split
    // div/mod 10⁶ so each component stays exact past 10¹¹ rows per group
    // (100 TB of lineitem ≈ 10¹² rows over 4 groups; Σpc ≤ 2.8e18 there —
    // within 2⁶³ — and the split components orders of magnitude below).
    // The exact decimal values are reassembled on the 4 output rows and
    // cast to double — identical exact rationals, identical IEEE casts,
    // identical oracle hash (decimal(15,2) cast ≡ floor(x·100+0.5) on
    // non-negative hundredths data; the gate verifies value-by-value).
    val d38 = DecimalType(38, 0)
    def exactDouble(unscaled: Column, pow10: Long): Column =
      (unscaled.cast(d38) / pow10).cast("double")
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("cast(floor(l_quantity * 100 + 0.5d) as bigint)").as("qc"),
        expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").as("pc"),
        expr("cast(floor(l_discount * 100 + 0.5d) as bigint)").as("dk"),
        expr("cast(floor(l_tax * 100 + 0.5d) as bigint)").as("tk"))
      .withColumn("disc_u", col("pc") * (lit(100L) - col("dk")))
      .withColumn("chg_u", col("disc_u") * (lit(100L) + col("tk")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qc")).as("sqc"),
        sum(col("pc")).as("spc"),
        sum(col("dk")).as("sdk"),
        sum(expr("disc_u div 1000000")).as("sda"),
        sum(expr("disc_u % 1000000")).as("sdb"),
        sum(expr("chg_u div 1000000")).as("sca"),
        sum(expr("chg_u % 1000000")).as("scb"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"), col("l_linestatus"),
        exactDouble(col("sqc"), 100L).as("sum_qty"),
        exactDouble(col("spc"), 100L).as("sum_base_price"),
        exactDouble(col("sda").cast(d38) * 1000000L + col("sdb"), 10000L)
          .as("sum_disc_price"),
        exactDouble(col("sca").cast(d38) * 1000000L + col("scb"), 1000000L)
          .as("sum_charge"),
        (exactDouble(col("sqc"), 100L) / col("cnt")).as("avg_qty"),
        (exactDouble(col("spc"), 100L) / col("cnt")).as("avg_price"),
        (exactDouble(col("sdk"), 100L) / col("cnt")).as("avg_disc"),
        col("cnt").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-style shipping priority: top 10 undelivered orders by revenue
    * for one market segment. orders and customer both scale with the data
    * (fact and sf-proportional tables), so neither is broadcast: the joins
    * shuffle on their keys and AQE picks broadcast at runtime only if a side
    * actually turns out small. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier revenue by nation within one region and
    * order-date year; exercises a 6-way join with two broadcast dims. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      // customer is sf-proportional (billions of rows at 100 TB) — never
      // force-broadcast it; shuffle on the join key and let AQE decide.
      .join(cust.as("c"), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10-style returned-item losses: top 20 customers by revenue lost
    * to returned lineitems in a quarter. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      // customer scales with sf — shuffle join, AQE decides (see q5).
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Broadcast-join demo: revenue by part brand (fact ⋈ dim). The
    * broadcast is DECIDED BY SIZE, not hinted: `part` is sf-proportional
    * (unlike nation/region), so a hard `broadcast()` hint would OOM the
    * build side on a corpus where part outgrows executor memory — the
    * planner's size-statistics threshold (plus AQE's runtime re-check)
    * picks BroadcastHashJoin while the 2-column projection is small and
    * degrades to a shuffled join when it isn't. PLANS.md still shows
    * BroadcastHashJoin at gate scale, now chosen instead of forced. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    // r16: the revenue sum runs over EVERY joined lineitem row (this is
    // the one unfiltered discounted-revenue scan in the family), so the
    // per-row decimal multiply dominated — same long-decomposition as q1:
    // disc_u = pc·(100−dk) in 10⁻⁴ units, split div/mod 10⁶, exact value
    // reassembled per brand. Identical double, oracle hash unchanged.
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * 100 + lit(0.5d)).cast("long").as("pc"),
        floor(col("l_discount") * 100 + lit(0.5d)).cast("long").as("dk"))
      .withColumn("disc_u", col("pc") * (lit(100L) - col("dk")))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(expr("disc_u div 1000000")).as("sda"),
        sum(expr("disc_u % 1000000")).as("sdb"),
        count(lit(1)).as("n_items"))
      .select(col("p_brand"),
        ((col("sda").cast(DecimalType(38, 0)) * 1000000L + col("sdb")) / 10000L)
          .cast("double").as("revenue"),
        col("n_items"))
      .orderBy("p_brand")
  }

  /** Left-semi join (EXISTS): customers that have at least one order,
    * counted per market segment. */
  def semiCustomersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    cust.join(ord, Seq("c_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value order
    * (> 300k), per segment. The predicate on the right side keeps the
    * result non-empty at every scale factor. */
  def antiCustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("c_custkey"))
    cust.join(ord, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Left-outer join preserving empty groups: customer count and total
    * account balance per nation, zeros/nulls kept for empty nations. */
  def outerNationCustomers(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    nation.join(cust, col("c_nationkey") === col("n_nationkey"), "left_outer")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(
        count(col("c_custkey")).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy("n_nationkey")
  }

  /** Full-outer join: per-nation customer vs supplier presence, nations
    * appearing on either side kept (nulls coalesced for the oracle). */
  def fullOuterNationPresence(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nk"), "full_outer")
      .select(col("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nk")
  }

  /** Explicit GROUPING SETS ((status), (priority), ()) with grouping-id
    * disambiguation — the generalization rollup/cube specialize. */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("status", "priority")

  /** Distinct aggregates: order counts / distinct customers / priority
    * spread per order status. */
  def distinctAggOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sumMoney(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderstatus")

  /** ROLLUP region → nation over customer account balances. Grouping-set
    * null markers are coalesced to 'ALL' so the oracle compare is
    * null-free. */
  def rollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val cust = Tables.customer(spark, dir)
    cust.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("total_acctbal"))
      .orderBy("region", "nation")
  }

  /** CUBE status × priority over orders. */
  def cubeStatusPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sumMoney(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("status", "priority")

  /** Correlated scalar subquery — orders priced above their own customer's
    * average — via the SQL surface: Catalyst decorrelates the per-row
    * subquery into an aggregate + join (no per-row re-execution), which is
    * the whole point of declaring it rather than hand-writing the join.
    * The average is computed as one double division of a decimal-exact sum
    * on both engines so the > boundary is bit-identical. */
  def subqueryOrdersAboveCustAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_above,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_above
        |FROM orders_v o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Top-k with deterministic tiebreak: 100 most expensive orders. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Set operations on the nation-key domains of customers vs suppliers:
    * one row per (op, nationkey) for UNION / INTERSECT / EXCEPT. */
  def setopsNations(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk")).distinct()
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")).distinct()
    val u = c.union(s).distinct().select(lit("union").as("op"), col("nk"))
    val i = c.intersect(s).select(lit("intersect").as("op"), col("nk"))
    val e = c.except(s).select(lit("except").as("op"), col("nk"))
    u.union(i).union(e).orderBy("op", "nk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "join_broadcast_brand_revenue" -> (brandRevenue _),
    "join_semi_customers_with_orders" -> (semiCustomersWithOrders _),
    "join_anti_customers_without_orders" -> (antiCustomersWithoutOrders _),
    "join_outer_nation_customers" -> (outerNationCustomers _),
    "join_full_outer_presence" -> (fullOuterNationPresence _),
    "agg_grouping_sets_orders" -> (groupingSetsOrders _),
    "sub_orders_above_cust_avg" -> (subqueryOrdersAboveCustAvg _),
    "agg_distinct_orders" -> (distinctAggOrders _),
    "agg_rollup_region_nation" -> (rollupRegionNation _),
    "agg_cube_status_priority" -> (cubeStatusPriority _),
    "topk_orders" -> (topkOrders _),
    "setops_nations" -> (setopsNations _)
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "join_broadcast_brand_revenue" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem, part WHERE l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_semi_customers_with_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_anti_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_outer_nation_customers" ->
      """SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_acctbal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "join_full_outer_presence" ->
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nk""".stripMargin,
    "agg_grouping_sets_orders" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "sub_orders_above_cust_avg" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_above,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_above
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_distinct_orders" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_rollup_region_nation" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_acctbal
        |FROM customer, nation, region
        |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin,
    "agg_cube_status_priority" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "setops_nations" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT 'union' AS op, nk FROM (SELECT nk FROM c UNION SELECT nk FROM s)
        |UNION ALL SELECT 'intersect', nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
        |UNION ALL SELECT 'except', nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
        |ORDER BY op, nk""".stripMargin
  )
}
