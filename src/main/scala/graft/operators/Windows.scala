package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Window-function operators: ranking, analytic (lag/lead), running and
  * framed aggregates. Every window ordering includes a unique tiebreak
  * column so results are total-order deterministic, and framed/running
  * money sums aggregate DECIMAL (exact) then cast back to double — see
  * [[Relational]] for the rationale.
  */
object Windows {

  private def dec(c: Column): Column = c.cast(DecimalType(15, 2))

  /** SQL-standard ntile bucket for global row number `rn` (1-based) out of
    * `n` rows in `k` buckets: the first n%k buckets get one extra row.
    * Closed form used by the two-pass global ranking; property-tested
    * against Spark's built-in ntile in WindowsSpec. */
  def ntileBucket(k: Long, n: Long)(rn: Column): Column = {
    val small = n / k
    val extras = n % k
    val cut = extras * (small + 1)
    (when(rn <= cut, floor((rn - 1) / lit(small + 1)))
      .otherwise(lit(extras) + floor((rn - 1 - cut) / lit(math.max(small, 1L))))
      + 1).cast("int")
  }

  /** Top-3 orders per customer by price: row_number + rank over a
    * per-customer window. */
  def rankTop3OrdersPerCust(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running (cumulative) spend per sampled user over the event stream. */
  def runningValueByUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") % 25 === 0)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .orderBy("user_id", "rn")
  }

  /** Per-user event-to-event value delta via lag(). */
  def lagDeltaByUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") % 25 === 0)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta",
        (dec(col("value")) - dec(col("prev_value"))).cast("double"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Customer wealth quartiles: ntile(4) + dense_rank + percent_rank over
    * account balance.
    *
    * Deliberately NOT a global `Window.orderBy(...)` — an unpartitioned
    * window moves the whole table into a single task. Instead: a distributed
    * range-partitioned sort (`orderBy` = sample + range exchange), then
    * `zipWithIndex` assigns contiguous global row numbers with one extra
    * lightweight per-partition-count job — two passes, no single-partition
    * stage, scale-safe at any size. Because the sort key includes the unique
    * `c_custkey` tiebreak, the global row number IS the rank and the dense
    * rank, so percent_rank and ntile derive from it and the total count in
    * closed form (ntile: first n%k buckets get one extra row).
    */
  def ntileCustomers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val base = Tables.customer(spark, dir).select(col("c_custkey"), col("c_acctbal"))
    val n = base.count()
    val sorted = base.orderBy(col("c_acctbal").desc, col("c_custkey"))
    val schema = sorted.schema.add(StructField("rn", LongType, nullable = false))
    val withRn = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
    withRn.select(
      col("c_custkey"), col("c_acctbal"),
      ntileBucket(4L, n)(col("rn")).as("quartile"),
      col("rn").cast("int").as("dr"),
      ((col("rn") - 1).cast("double") / lit(math.max(n - 1, 1L))).as("pr"))
      .orderBy("dr")
  }

  /** Moving 3-row quantity sum per supplier ordered by ship date
    * (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). */
  def movingSumSupplier(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(-2, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 20)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"))
      .withColumn("moving_qty", sum(dec(col("l_quantity"))).over(w).cast("double"))
      .orderBy(col("l_suppkey") +: order: _*)
  }

  /** Value-navigation window functions: first/last/nth over the full
    * partition frame (deterministic total ordering per supplier). */
  def firstLastValue(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"))
      .withColumn("first_qty", first(col("l_quantity")).over(w))
      .withColumn("last_qty", last(col("l_quantity")).over(w))
      .withColumn("second_qty", nth_value(col("l_quantity"), 2).over(w))
      .orderBy(col("l_suppkey") +: order: _*)
  }

  /** RANGE-framed window: per-user rolling 1-hour value sum over the event
    * stream — the frame is bounded by the ORDER-BY VALUE (epoch seconds),
    * not a row count, so sparse and dense hours weight correctly. Epoch
    * seconds (not raw timestamps) keep the range arithmetic identical in
    * both engines. */
  def rollingHourValue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-3599L, 0L)
    Tables.events(spark, dir)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("long").as("epoch_s"), col("value"))
      .withColumn("hour_value", sum(dec(col("value"))).over(w).cast("double"))
      .select("user_id", "event_id", "ts", "hour_value")
      .orderBy("user_id", "ts", "event_id")
  }

  /** Ratio-to-report: each customer's share of its nation's total balance —
    * the classic reporting window (value / SUM OVER partition). The
    * denominator is a DECIMAL window sum (order-independent, exact), so
    * the one double division at the end is bit-identical in both engines;
    * a raw double window sum would hash-diverge with partition order. */
  def shareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("nation_total", sum(dec(col("c_acctbal"))).over(w).cast("double"))
      .withColumn("share", col("c_acctbal") / col("nation_total"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** Exact rolling median of order totals per customer (ROWS BETWEEN 4
    * PRECEDING AND CURRENT ROW). Spark has no holistic median window
    * function, so the frame is materialized explicitly: collect_list over
    * the 5-row frame, sort, average the two middle elements — the textbook
    * even/odd median on exact integer cents (DECIMAL(12,2)·100), with the
    * only floating-point ops two final IEEE divisions spelled identically
    * in the oracle. Frames are O(1) rows, so the materialization cost is a
    * constant per row regardless of table size — safe at 100 TB where a
    * growing frame would not be. */
  def rollingMedianOrders(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("o_orderdate"), col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
      .rowsBetween(-4, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
      .withColumn("arr", sort_array(collect_list(col("cents")).over(w)))
      .select(col("o_custkey"), col("o_orderkey"),
        expr("""(cast(arr[(size(arr)+1) div 2 - 1] as double)
               | + cast(arr[size(arr) div 2] as double)) / 2.0 / 100.0"""
          .stripMargin).as("rolling_median"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exponentially weighted moving average of event value per user over a
    * bounded 16-event lookback (α = 0.25). EWMA's recursion is not a SQL
    * window aggregate, so the frame is materialized (O(1) rows — the
    * truncation both bounds memory and keeps the 100 TB shape) and folded
    * OLDEST→NEWEST with the oldest value as seed: exactly DuckDB's
    * list_reduce semantics, so both engines run the identical IEEE op
    * sequence on identical doubles — bit-equal without any quantization. */
  def ewmaValueByUser(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(-15, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") % 25 === 0)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("arr", collect_list(col("value")).over(w))
      .withColumn("ewma", expr(
        "aggregate(slice(arr, 2, size(arr) - 1), arr[0]," +
          " (acc, x) -> 0.25d * x + 0.75d * acc)"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("ewma"))
      .orderBy(col("user_id") +: order: _*)
  }

  /** Running DISTINCT-count per user — how many distinct event types the
    * user has touched as of each event. COUNT(DISTINCT) OVER a running
    * frame is unsupported (and would hold per-row sets); the scalable
    * identity is: flag each row that is the FIRST occurrence of its
    * (user, type) — row_number = 1 over the per-(user, type) window — and
    * running-SUM the flags over the per-user window. Two window passes,
    * each over a properly keyed partition; the (user, type) pass shuffles
    * the finer key, the user pass the coarser — no global window, no
    * per-row distinct state. */
  def cumulativeDistinct(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val firstW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(order: _*)
    val cumW = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("is_first",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("n_distinct_types", sum(col("is_first")).over(cumW))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("n_distinct_types"))
      .orderBy(col("user_id") +: order: _*)
  }

  /** Running drawdown per user: cumulative value (integer cents), its
    * running peak, and peak-minus-current — the risk metric every
    * portfolio/engagement dashboard draws. Two stacked running windows
    * over the SAME (user_id; ts, event_id) partitioning, so Spark plans
    * one exchange and one sort and evaluates both frames in a single
    * window stage; all three outputs are exact BIGINTs. */
  def drawdownByUser(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (dec(col("value")) * 100).cast("long").as("cents"))
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .withColumn("peak_cents", max(col("cum_cents")).over(w))
      .select(col("user_id"), col("event_id"), col("cum_cents"),
        col("peak_cents"),
        (col("peak_cents") - col("cum_cents")).as("drawdown_cents"))
      .orderBy(col("user_id") +: order: _*)
  }

  /** Month-over-month revenue change per return flag: exact cents, lag
    * over the (flag; month) partition of the AGGREGATED monthly series,
    * percent change as one final division (NULL on each flag's first
    * month, identically in both engines). The reporting query behind
    * every "vs last period" tile. */
  def momChange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("mon"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long")).as("rev_cents"))
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .select(col("l_returnflag"),
        date_format(col("mon"), "yyyy-MM-dd").as("month"),
        col("rev_cents"), col("prev_cents"),
        (col("rev_cents") - col("prev_cents")).as("delta_cents"),
        ((col("rev_cents") - col("prev_cents")).cast("double")
          / col("prev_cents").cast("double") * lit(100.0)).as("pct_change"))
      .orderBy("l_returnflag", "month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_mom_change" -> (momChange _),
    "win_drawdown" -> (drawdownByUser _),
    "win_cumulative_distinct" -> (cumulativeDistinct _),
    "win_ewma" -> (ewmaValueByUser _),
    "win_rolling_median" -> (rollingMedianOrders _),
    "win_share_of_total" -> (shareOfTotal _),
    "win_rolling_hour_value" -> (rollingHourValue _),
    "win_first_last_value" -> (firstLastValue _),
    "win_rank_top3_orders_per_cust" -> (rankTop3OrdersPerCust _),
    "win_running_value_by_user" -> (runningValueByUser _),
    "win_lag_delta_by_user" -> (lagDeltaByUser _),
    "win_ntile_customers" -> (ntileCustomers _),
    "win_moving_sum_supplier" -> (movingSumSupplier _),
    "win_cume_dist_suppliers" -> (cumeDistSuppliers _)
  )

  /** cume_dist + percent_rank per nation over supplier balances — the two
    * distribution window functions, properly partitioned (per-nation
    * windows, never global). Tie semantics matter: both suppliers of a
    * tied balance share one cume_dist/percent_rank value, which both
    * engines define identically; the rn tiebreak makes row ORDER total. */
  def cumeDistSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal"))
    Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("pr", percent_rank().over(w))
      .orderBy("s_nationkey", "s_acctbal", "s_suppkey")
  }

  val oracle: Map[String, String] = Map(
    "win_mom_change" ->
      """WITH s AS (SELECT l_returnflag, date_trunc('month', l_shipdate) AS mon,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY 1, 2),
        |l AS (SELECT l_returnflag, mon, rev_cents,
        |    lag(rev_cents) OVER (PARTITION BY l_returnflag ORDER BY mon) AS prev_cents
        |  FROM s)
        |SELECT l_returnflag, strftime(mon, '%Y-%m-%d') AS month,
        |  rev_cents, prev_cents,
        |  rev_cents - prev_cents AS delta_cents,
        |  CAST(rev_cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)
        |    * 1.0e2 AS pct_change
        |FROM l ORDER BY l_returnflag, month""".stripMargin,
    "win_drawdown" ->
      """WITH c AS (SELECT user_id, event_id, ts,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM events),
        |p AS (SELECT *,
        |    CAST(MAX(cum_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS peak_cents
        |  FROM c)
        |SELECT user_id, event_id, cum_cents, peak_cents,
        |  peak_cents - cum_cents AS drawdown_cents
        |FROM p ORDER BY user_id, ts, event_id""".stripMargin,
    "win_cumulative_distinct" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY ts, event_id) = 1
        |         THEN 1 ELSE 0 END AS is_first
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |  CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_distinct_types
        |FROM f ORDER BY user_id, ts, event_id""".stripMargin,
    "win_share_of_total" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2)))
        |    OVER (PARTITION BY c_nationkey) AS DOUBLE) AS nation_total,
        |  c_acctbal / CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2)))
        |    OVER (PARTITION BY c_nationkey) AS DOUBLE) AS share
        |FROM customer
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "win_rolling_hour_value" ->
      """SELECT user_id, event_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(15,2))) OVER
        |    (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |     RANGE BETWEEN 3599 PRECEDING AND 0 FOLLOWING) AS DOUBLE) AS hour_value
        |FROM events WHERE user_id % 50 = 0
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "win_first_last_value" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |  first_value(l_quantity) OVER w AS first_qty,
        |  last_value(l_quantity) OVER w AS last_qty,
        |  nth_value(l_quantity, 2) OVER w AS second_qty
        |FROM lineitem WHERE l_suppkey <= 10
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "win_rank_top3_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_running_value_by_user" ->
      """SELECT user_id, event_id, ts, value,
        |  CAST(SUM(CAST(value AS DECIMAL(15,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn
        |FROM events WHERE user_id % 25 = 0 ORDER BY user_id, rn""".stripMargin,
    "win_lag_delta_by_user" ->
      """SELECT user_id, event_id, ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  CAST(CAST(value AS DECIMAL(15,2)) - CAST(lag(value, 1) OVER w AS DECIMAL(15,2)) AS DOUBLE) AS delta
        |FROM events WHERE user_id % 25 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "win_ntile_customers" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  CAST(dense_rank() OVER w AS INTEGER) AS dr,
        |  percent_rank() OVER w AS pr
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY dr""".stripMargin,
    "win_moving_sum_supplier" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty
        |FROM lineitem WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "win_cume_dist_suppliers" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
        |ORDER BY s_nationkey, s_acctbal, s_suppkey""".stripMargin,
    "win_ewma" ->
      """WITH f AS (SELECT user_id, event_id, ts, value,
        |  list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
        |FROM events WHERE user_id % 25 = 0)
        |SELECT user_id, event_id, ts, value,
        |  list_reduce(arr, (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
        |FROM f ORDER BY user_id, ts, event_id""".stripMargin,
    "win_rolling_median" ->
      """WITH f AS (SELECT o_custkey, o_orderkey,
        |  list_sort(list(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr
        |FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  (CAST(arr[(len(arr)+1)//2] AS DOUBLE)
        |   + CAST(arr[len(arr)//2 + 1] AS DOUBLE)) / 2.0 / 100.0 AS rolling_median
        |FROM f ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
