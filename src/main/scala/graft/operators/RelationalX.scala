package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Extended TPC-H-adapted relational coverage (the queries Q-numbered here
  * follow the public TPC-H spec shapes, adapted to the driver's simplified
  * schema: no partsupp table, no shipmode/commitdate/receiptdate/container
  * columns, nations named NATION_0..24).
  *
  * Same determinism discipline as [[Relational]]: money is aggregated as
  * DECIMAL (exact, order-independent) and cast back to DOUBLE at the end;
  * ratios divide two already-exact values in double space (IEEE division is
  * correctly rounded, so both engines agree bit-for-bit); every query ends
  * in a total ORDER BY.
  *
  * Same scale discipline: broadcast hints only on fixed-size dims
  * (region/nation/part/supplier); customer/orders/lineitem shuffle on their
  * join keys and AQE picks the physical join at runtime.
  */
object RelationalX {

  private def dec(c: Column): Column = c.cast(DecimalType(15, 2))
  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  private def rate(c: Column): Column = c.cast(DecimalType(3, 2))
  private def discounted(price: Column, disc: Column): Column =
    money(price) * (lit(1).cast(DecimalType(3, 2)) - rate(disc))
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** TPC-H Q4: order-priority checking — orders placed in a quarter with at
    * least one lineitem shipped after the order date (EXISTS → left-semi
    * join with an extra non-equi conjunct on the hash join). */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1996-04-01"))
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6: forecasting-revenue change — a pure scan+filter+agg whose
    * whole predicate must push into the parquet scan. */
  def q6RevenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") < ts("1997-01-01") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q7: volume shipping between two nations, by supplier nation /
    * customer nation / ship year (both directions of the pair). */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") < ts("1998-01-01"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8: national market share — NATION_5's share of STANDARD-part
    * revenue sold into the ASIA region, per order year. Share = double
    * division of two decimal-exact sums. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val natC = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_nk"), col("n_regionkey"))
    val natS = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))
    val part = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val vol = li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_nk"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_nk"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        discounted(col("l_extendedprice"), col("l_discount")).as("vol"),
        col("supp_nation"))
    vol.groupBy(col("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_5", col("vol"))
          .otherwise(lit(0).cast(DecimalType(16, 4)))).cast("double") /
        sum(col("vol")).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 (adapted: no partsupp, so supply cost is modeled as half the
    * part's retail price): profit per supplier nation per year on parts
    * whose name contains 'widget'. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val amount =
      discounted(col("l_extendedprice"), col("l_discount")) -
        money(col("p_retailprice")) * money(col("l_quantity")) * rate(lit(0.5))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q13: customer order-count distribution — how many customers
    * placed exactly N orders (N = 0 kept via left outer join). */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("c_count").desc)
  }

  /** TPC-H Q14: promotion effect — percentage of one month's revenue from
    * PROMO-type parts. */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-03-01") &&
              col("l_shipdate") < ts("1996-04-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO",
            discounted(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0).cast(DecimalType(16, 4)))).cast("double") /
        sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q15: top supplier — supplier(s) whose quarterly revenue equals
    * the maximum. The max is a 1-row aggregate cross-joined back (broadcast
    * of a single row — scale-safe, unlike a global unpartitioned window). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17: small-quantity-order revenue — lineitems of one brand
    * whose quantity is below 20% of that part's average quantity; the
    * per-part average is a pre-aggregation joined back (Catalyst turns the
    * spec's correlated subquery into exactly this shape). */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#5").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQty = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)) * 0.2)
        .as("qty_threshold"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
        .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18: large-volume customers — orders whose total quantity
    * exceeds 250 units, with customer attribution. */
  def q18LargeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    // r16: exact hundredths in codegen longs instead of a per-row decimal
    // cast feeding BigDecimal accumulation over the full lineitem scan —
    // identical exact value reassembled per order (see Relational.q1's
    // equivalence note), so the HAVING compare and the gate hash are
    // unchanged.
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_quantity") * 100 + lit(0.5d)).cast("long")).as("qc"))
      .select(col("l_orderkey"),
        (col("qc").cast(DecimalType(38, 0)) / 100).cast("double").as("total_qty"))
      .filter(col("total_qty") > 250.0)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19: disjunctive brand/size/quantity predicates — three OR'd
    * conjunct groups over the part join, a classic pushdown/codegen
    * stress shape. */
  def q19DisjunctivePredicates(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 (adapted: nationkey stands in for the phone country code):
    * idle rich customers — above-average positive balance, no orders —
    * per nation. The global average is a 1-row broadcast, the "no orders"
    * test a left-anti join. */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ord, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntry"))
      .agg(count(lit(1)).as("n_custs"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy("cntry")
  }

  /** MERGE/upsert as one declarative full-outer join — the batch
    * formulation of `MERGE INTO customer USING updates`: matched rows get
    * acctbal + period spend, unmatched targets pass through, unmatched
    * sources (a deterministic slice of update keys shifted out of the key
    * range to exercise the insert branch) become new rows. The join keys
    * on custkey so at scale this is one co-partitioned shuffle of target
    * and updates; the arithmetic is one IEEE double add of two exact
    * values per row, identical in both engines. */
  def mergeUpsertCustomers(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1996-07-01"))
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("spend"))
    val upd = spend.select(
      when(col("o_custkey") % 101 === 0, col("o_custkey") + 1000000L)
        .otherwise(col("o_custkey")).as("u_custkey"),
      col("spend"))
    val tgt = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal")
    tgt.join(upd, col("c_custkey") === col("u_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("u_custkey")).as("custkey"),
        coalesce(col("c_name"), concat(lit("NEW_"), col("u_custkey")))
          .as("name"),
        (coalesce(col("c_acctbal"), lit(0.0)) +
          coalesce(col("spend"), lit(0.0))).as("acctbal"),
        when(col("c_custkey").isNotNull && col("u_custkey").isNotNull, "updated")
          .when(col("u_custkey").isNull, "unchanged")
          .otherwise("inserted").as("status"))
      .orderBy("custkey")
  }

  /** SCD Type-2 dimension history: applying a batch of balance updates to
    * the customer dimension yields, per updated customer, a closed-out
    * version-1 row (valid_to = the batch date) plus an open version-2 row;
    * untouched customers keep their single open row. Validity bounds ship
    * as ISO strings (DATE columns compare shakily through parquet/pandas).
    * Plan shape: one shuffle join of target and updates on custkey, then a
    * union of three branch projections over the same joined frame —
    * Catalyst collapses it into one pass; nothing is recomputed per
    * branch. */
  def scd2CustomerHistory(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1996-07-01"))
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("spend"))
    val tgt = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal")
    val joined = tgt.join(spend, col("c_custkey") === col("o_custkey"), "left_outer")
    val v1 = joined.select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"), lit(1).as("version"),
      lit("1995-01-01").as("valid_from"),
      when(col("o_custkey").isNotNull, "1996-07-01").as("valid_to"))
    val v2 = joined.filter(col("o_custkey").isNotNull).select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      (col("c_acctbal") + col("spend")).as("acctbal"), lit(2).as("version"),
      lit("1996-07-01").as("valid_from"),
      lit(null).cast("string").as("valid_to"))
    v1.union(v2).orderBy("custkey", "version")
  }

  /** TPC-H Q12 core shape (adapted: no shipmode/receiptdate — lateness is
    * ship-vs-order-date > 90 days): per order-year, count late vs on-time
    * lineitems split by high priority (1-URGENT/2-HIGH) vs low, as
    * CASE-bucketed conditional sums over one join. */
  def q12LateShipments(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val late = datediff(col("l_shipdate"), col("o_orderdate")) > 90
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(high && late, 1L).otherwise(0L)).as("high_late"),
        sum(when(high && !late, 1L).otherwise(0L)).as("high_ontime"),
        sum(when(!high && late, 1L).otherwise(0L)).as("low_late"),
        sum(when(!high && !late, 1L).otherwise(0L)).as("low_ontime"))
      .orderBy("o_year")
  }

  /** TPC-H Q2 core shape (adapted: no partsupp — the "offer" is a
    * supplier's average sale price of a part, derived from lineitem):
    * for large parts, the EUROPE supplier(s) whose average price equals
    * the per-part minimum. Exercises the correlated-min join the spec's
    * Q2 is famous for, on grouped data. */
  def q2MinPriceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_size") >= 45).select("p_partkey", "p_name")
    val region = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val nation = Tables.nation(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val offers = Tables.lineitem(spark, dir)
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"))
      .agg((sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)))
        .as("avg_price"))
    val minPrice = offers.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min(col("avg_price")).as("min_price"))
    offers.join(minPrice,
        col("p_partkey") === col("m_partkey") &&
          col("avg_price") === col("min_price"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("avg_price"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Unpivot (wide→long): per-status order counts by priority pivoted
    * wide, then stack()ed back to (priority, status, n) rows — the inverse
    * reshape of `agg_pivot_priority_by_status`, proving the round trip. */
  def unpivotPriorityStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .selectExpr("o_orderpriority",
        "stack(3, 'F', F, 'O', O, 'P', P) as (status, n)")
      .orderBy("o_orderpriority", "status")

  /** TPC-H Q11 core shape (adapted: no partsupp — a part's "value" is its
    * discounted revenue through NATION_3's suppliers): parts whose value
    * exceeds 1/1000 of the total. The global total is a 1-row broadcast;
    * the threshold test is EXACT decimal arithmetic (`value*1000 > total`)
    * so neither engine can disagree on a borderline part the way a
    * double `0.001 * total` could. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 3).select("s_suppkey")
    val pv = Tables.lineitem(spark, dir)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .as("value_dec"))
    val total = pv.agg(sum(col("value_dec")).as("total_dec"))
    pv.crossJoin(broadcast(total))
      .filter(col("value_dec") * 1000 > col("total_dec"))
      .select(col("p_partkey"), col("value_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q16: supplier diversity per part attribute — distinct suppliers
    * per (brand, type, size) over observed lineitem pairs, excluding one
    * brand and suppliers in deficit (the spec's complaints filter, as a
    * left-anti join). */
  def q16SupplierPartCounts(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" &&
              col("p_size").isin(1, 9, 14, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 core shape (adapted: no partsupp availqty — "excess" is a
    * supplier shipping > 50 units of one 'small *' part in a year):
    * nested IN subqueries become a pre-aggregation + left-semi join;
    * the quantity sum is decimal-exact so the > 50 threshold is
    * engine-independent. */
  def q20ExcessShippers(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .filter(col("p_name").like("small %")).select("p_partkey")
    val shippers = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") < ts("1997-01-01"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 50)
      .select("l_suppkey").distinct()
    val nation = Tables.nation(spark, dir).filter(col("n_name") === "NATION_9")
    Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21 core shape (adapted: no receipt/commit dates — "late" is
    * shipping > 60 days after the order date): per NATION_6 supplier, the
    * number of finalized multi-supplier orders where it was the ONLY late
    * supplier.
    *
    * The spec's correlated EXISTS ("another supplier on this order") and
    * NOT EXISTS ("no other LATE supplier") collapse into per-order
    * aggregates: an order qualifies iff countDistinct(supplier) ≥ 2 and
    * it has exactly ONE distinct late supplier — who takes the blame.
    * That's two partial-aggregated shuffles on orderkey and one
    * co-partitioned join, instead of the literal translation's
    * distinct + inequality-semi + inequality-anti chain (three wide
    * shuffles whose join conditions carry residual filters). Semantics
    * are identical; the oracle runs the EXISTS/NOT EXISTS form. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val ordF = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    // distinct late suppliers per finalized order; n_late==1 → its blame
    // falls on the one supplier (min == that supplier)
    val lateAgg = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_orderkey").as("orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_late"),
        min(col("l_suppkey")).as("lone_supp"))
      .filter(col("n_late") === 1)
    val suppCnt = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .filter(col("n_supp") >= 2)
    val nation = Tables.nation(spark, dir).filter(col("n_name") === "NATION_6")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    lateAgg.join(suppCnt, col("orderkey") === col("l_orderkey"))
      .join(supp, col("lone_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** SALTED skew join — the manual mitigation for a shuffle join whose
    * key distribution concentrates on a few hot keys (the pre-AQE
    * technique, still required when AQE's skew thresholds don't trigger
    * or the build side must stay a shuffle join): replicate the dimension
    * side saltFactor ways with a salt column, spread the fact side across
    * salts with a deterministic per-row salt, and join on (key, salt) —
    * each hot key's rows now land on saltFactor reducers instead of one.
    * Every fact row still matches EXACTLY one replica, so the join result
    * — per-segment order counts and revenue — is identical to the plain
    * join the oracle runs; the gate proves the rewrite is semantics-free
    * (SaltedTreatmentSpec proves it at ANY factor).
    *
    * THE FACTOR IS ADVISED, NOT HARD-CODED (r12 verdict item 4): the
    * gated entry consumes [[Diagnostics.advisedSaltFactor]] for the
    * join's actual key (orders.o_custkey) — the diagnosis→treatment loop
    * closed in code — and emits the applied factor as `salt_factor`,
    * which the oracle re-derives with the same capped-ceiling formula.
    *
    * Scale shape: dimension inflation is saltFactor× (bounded by the
    * advisor's [[Diagnostics.SaltMaxFactor]] cap, and only on the
    * smaller side); the fact side's salt is computed map-side from
    * o_orderkey, adding no shuffle of its own. */
  def saltedSkewJoinWith(spark: SparkSession, dir: String,
      saltFactor: Long): DataFrame = {
    val salted = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("fsalt", (col("o_orderkey") % saltFactor).cast("int"))
      .join(salted, col("o_custkey") === col("c_custkey") &&
        col("salt") === col("fsalt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .withColumn("salt_factor", lit(saltFactor))
      .orderBy("c_mktsegment")
  }

  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame =
    saltedSkewJoinWith(spark, dir,
      Diagnostics.advisedSaltFactor(spark, dir, "orders", "o_custkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "joinx_salted_skew" -> (saltedSkewJoin _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_supplier_part_counts" -> (q16SupplierPartCounts _),
    "q20_excess_shippers" -> (q20ExcessShippers _),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers _),
    "q12_late_shipments" -> (q12LateShipments _),
    "q2_min_price_supplier" -> (q2MinPriceSupplier _),
    "agg_unpivot_priority_status" -> (unpivotPriorityStatus _),
    "scd2_customer_history" -> (scd2CustomerHistory _),
    "merge_upsert_customers" -> (mergeUpsertCustomers _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q6_revenue_forecast" -> (q6RevenueForecast _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q14_promo_effect" -> (q14PromoEffect _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q18_large_volume_customers" -> (q18LargeVolumeCustomers _),
    "q19_disjunctive_predicates" -> (q19DisjunctivePredicates _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _)
  )

  private val discSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"

  val oracle: Map[String, String] = Map(
    // The oracle runs the PLAIN join: the salted rewrite must be
    // observationally identical to it, which is the whole point. The
    // applied factor is re-derived by the advisor's formula so the gate
    // also pins WHICH width the treatment consumed.
    "joinx_salted_skew" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue,
        |  ${Diagnostics.advisedSaltFactorSql("orders", "o_custkey")} AS salt_factor
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q11_important_parts" ->
      s"""WITH pv AS (
        |  SELECT l_partkey AS p_partkey, SUM($discSql) AS v
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 3
        |  GROUP BY 1)
        |SELECT p_partkey, CAST(v AS DOUBLE) AS part_value
        |FROM pv
        |WHERE v * 1000 > (SELECT SUM(v) FROM pv)
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "q16_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_excess_shippers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_9'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small %')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 50)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey AS orderkey, l_suppkey AS suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_6'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.orderkey
        |                AND l2.l_suppkey <> l1.suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.orderkey = l1.orderkey
        |                    AND l3.suppkey <> l1.suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q12_late_shipments" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    AND date_diff('day', o_orderdate, l_shipdate) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS high_late,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    AND date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS high_ontime,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    AND date_diff('day', o_orderdate, l_shipdate) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS low_late,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    AND date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS low_ontime
        |FROM lineitem, orders WHERE l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q2_min_price_supplier" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |  FROM lineitem, part, supplier, nation, region
        |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE' AND p_size >= 45
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, avg_price
        |FROM offers o
        |WHERE avg_price = (SELECT MIN(avg_price) FROM offers o2
        |                   WHERE o2.p_partkey = o.p_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "agg_unpivot_priority_status" ->
      """WITH pr AS (SELECT DISTINCT o_orderpriority FROM orders),
        |st AS (SELECT UNNEST(['F', 'O', 'P']) AS status),
        |c AS (SELECT o_orderpriority, o_orderstatus AS status, COUNT(*) AS n
        |      FROM orders GROUP BY 1, 2)
        |SELECT pr.o_orderpriority, st.status,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |FROM pr CROSS JOIN st
        |LEFT JOIN c ON c.o_orderpriority = pr.o_orderpriority
        |  AND c.status = st.status
        |ORDER BY pr.o_orderpriority, st.status""".stripMargin,
    "scd2_customer_history" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  GROUP BY o_custkey)
        |SELECT custkey, name, acctbal, version, valid_from, valid_to FROM (
        |  SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal,
        |    1 AS version, '1995-01-01' AS valid_from,
        |    CASE WHEN o_custkey IS NOT NULL THEN '1996-07-01' END AS valid_to
        |  FROM customer LEFT OUTER JOIN spend ON c_custkey = o_custkey
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal + spend, 2, '1996-07-01', NULL
        |  FROM customer JOIN spend ON c_custkey = o_custkey)
        |ORDER BY custkey, version""".stripMargin,
    "merge_upsert_customers" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  GROUP BY o_custkey),
        |upd AS (
        |  SELECT CASE WHEN o_custkey % 101 = 0 THEN o_custkey + 1000000
        |              ELSE o_custkey END AS u_custkey, spend
        |  FROM spend)
        |SELECT COALESCE(c_custkey, u_custkey) AS custkey,
        |  COALESCE(c_name, 'NEW_' || u_custkey) AS name,
        |  COALESCE(c_acctbal, 0.0) + COALESCE(spend, 0.0) AS acctbal,
        |  CASE WHEN c_custkey IS NOT NULL AND u_custkey IS NOT NULL THEN 'updated'
        |       WHEN u_custkey IS NULL THEN 'unchanged'
        |       ELSE 'inserted' END AS status
        |FROM customer FULL OUTER JOIN upd ON c_custkey = u_custkey
        |ORDER BY custkey""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_revenue_forecast" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM($discSql) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    $discSql AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem, part, supplier, orders, customer, nation n1, nation n2, region
        |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND s_nationkey = n2.n_nationkey
        |    AND r_name = 'ASIA' AND p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM($discSql
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(3,2))) AS DOUBLE) AS profit
        |FROM lineitem, part, supplier, orders, nation
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS n_custs FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY n_custs DESC, c_count DESC""".stripMargin,
    "q14_promo_effect" ->
      s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN $discSql ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
        |    / CAST(SUM($discSql) AS DOUBLE) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
        |  SELECT l_suppkey, CAST(SUM($discSql) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = l_suppkey
        |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_items
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
        |  AND l_quantity < (
        |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) * 0.2
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q18_large_volume_customers" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM customer, orders,
        |  (SELECT l_orderkey AS big_orderkey,
        |     CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS total_qty
        |   FROM lineitem GROUP BY l_orderkey) big
        |WHERE o_orderkey = big_orderkey AND c_custkey = o_custkey
        |  AND total_qty > 250.0
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive_predicates" ->
      s"""SELECT CAST(SUM($discSql) AS DOUBLE) AS revenue, COUNT(*) AS n_items
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q22_sales_opportunity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS cntry, COUNT(*) AS n_custs,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY cntry""".stripMargin
  )
}
