package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Advanced aggregation shapes: exact interpolated percentiles, pivot
  * (cross-tab), and salted two-stage aggregation — the standard hot-key
  * skew mitigation, shipped as a first-class operator.
  *
  * Percentile portability: Spark's exact `percentile` and DuckDB's
  * `quantile_cont` share the same linear-interpolation definition and were
  * verified bit-identical on this data; both sides sort exact doubles, so
  * no accumulation-order hazard exists.
  */
object AdvancedAggs {

  private def dec(c: Column): Column = c.cast(DecimalType(15, 2))

  /** Exact integer hundredths of a non-negative 2-dp money double, in pure
    * codegen long arithmetic: equals `(CAST(x AS DECIMAL(15,2)) * 100)
    * ::BIGINT` on every representable 2-dp double (floor(x·100 + 0.5)
    * reproduces the HALF_UP decimal cast — x·100 lands within ~1e-9 of
    * the integer, and exact-.5 doubles round up on both paths) without
    * the per-row java.math.BigDecimal detour the decimal cast pays (r16
    * optimization; the DuckDB oracles keep the decimal spelling and the
    * gate verifies the equivalence value-by-value on every corpus). */
  private def cents(c: Column): Column =
    floor(c * 100 + lit(0.5d)).cast("long")

  /** Exact interpolated percentiles of a value column per return flag,
    * from an AGGREGATED cumulative histogram instead of the built-in
    * `percentile` aggregate: `percentile` buffers a value→count map per
    * group in executor memory (value-domain-proportional state — the
    * pattern this repo evicts everywhere it appears), while the histogram
    * is a partial-aggregated (flag, value) count whose window pass runs
    * over distinct values only. The interpolation reproduces Spark's
    * `Percentile.getPercentile` IEEE tree exactly — position
    * `p·(n−1)`, order statistics at floor/ceil ranks, and the
    * `lo·(⌈pos⌉−pos) + hi·(pos−⌊pos⌋)` blend with the integral-position
    * branch — which DuckDB's `quantile_cont` matches on this data (the
    * pre-rewrite gate proved that equality; the rewrite preserves it). */
  private def histPercentiles(values: DataFrame, ps: Seq[(Double, String)])
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = Window.partitionBy("l_returnflag").orderBy("v")
    val whole = Window.partitionBy("l_returnflag")
    val cum = values
      .groupBy(col("l_returnflag"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("hi", sum(col("c")).over(byV))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("vd", col("v").cast("double"))
    val aggCols = ps.flatMap { case (p, nm) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      Seq(
        max(when((floor(pos).cast("long") + 1).between(col("lo"), col("hi")),
          col("vd"))).as(s"${nm}_lo"),
        max(when((ceil(pos).cast("long") + 1).between(col("lo"), col("hi")),
          col("vd"))).as(s"${nm}_hi"),
        max(pos).as(s"${nm}_pos"))
    }
    cum.groupBy("l_returnflag").agg(aggCols.head, aggCols.tail: _*)
      .select(col("l_returnflag") +: ps.map { case (_, nm) =>
        val pos = col(s"${nm}_pos")
        when(floor(pos) === ceil(pos), col(s"${nm}_lo"))
          .otherwise(col(s"${nm}_lo") * (ceil(pos) - pos)
            + col(s"${nm}_hi") * (pos - floor(pos))).as(nm)
      }: _*)
  }

  /** Exact price/quantity percentiles per return flag, via
    * [[histPercentiles]] (one histogram per value column). */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val prices = histPercentiles(
      li.select(col("l_returnflag"), col("l_extendedprice").as("v")),
      Seq(0.25 -> "p25_price", 0.5 -> "p50_price",
        0.75 -> "p75_price", 0.9 -> "p90_price"))
    val qty = histPercentiles(
      li.select(col("l_returnflag"), col("l_quantity").as("v")),
      Seq(0.5 -> "median_qty"))
    prices.join(qty, "l_returnflag")
      .select(col("l_returnflag"), col("p25_price"), col("p50_price"),
        col("p75_price"), col("p90_price"), col("median_qty"))
      .orderBy("l_returnflag")
  }

  /** Cross-tab: order counts per priority pivoted over the status domain. */
  def pivotPriorityByStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** Top spenders via salted two-stage aggregation: stage 1 groups on
    * (user_id, salt) so a hot user's rows spread across `salts` reducers,
    * stage 2 merges the partials per user. Decimal partials make the
    * result bit-equal to the direct single-stage aggregation (which the
    * oracle computes) — salting changes the plan, never the answer
    * (SaltedTreatmentSpec proves it at ANY factor). The gated entry
    * consumes [[Diagnostics.advisedSaltFactor]] for the aggregation's
    * actual key (events.user_id) instead of a hard-coded width — the
    * diagnosis→treatment bridge — and emits the applied factor, which
    * the oracle re-derives with the same formula. */
  def saltedTopUsersWith(spark: SparkSession, dir: String,
      salts: Long): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), (col("event_id") % salts).as("salt"))
      .agg(sum(dec(col("value"))).as("pv"), count(lit(1)).as("pn"))
      .groupBy(col("user_id"))
      .agg(sum(col("pv")).cast("double").as("total_value"),
        sum(col("pn")).as("n_events"))
      .withColumn("salt_factor", lit(salts))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)

  def saltedTopUsers(spark: SparkSession, dir: String): DataFrame =
    saltedTopUsersWith(spark, dir,
      Diagnostics.advisedSaltFactor(spark, dir, "events", "user_id"))

  /** Skew-proof fact⋈dim join via salting — the join-side counterpart of
    * [[saltedTopUsers]]: the fact side gets a deterministic salt from a
    * uniform column, the dim side is replicated across all salts
    * (explode), and the join keys on (user_id, salt) so a hot user's rows
    * spread over `salts` reducers instead of one. AQE's skew-join split
    * does this adaptively at runtime; the explicit form is the portable
    * pattern when key skew is known up front. The oracle computes the
    * unsalted equivalent — salting changes the plan, never the answer. */
  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val dim = Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("segment", (col("user_id") % 10).cast("long"))
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val facts = Tables.events(spark, dir)
      .select(col("user_id"), col("value"),
        (col("event_id") % salts).cast("int").as("salt"))
    facts.join(dimSalted, Seq("user_id", "salt"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("segment")
  }

  /** Pearson correlation per group from EXACT moment sums. Spark's (and
    * DuckDB's) built-in corr() accumulates doubles in partition order, so
    * two engines — or two runs over different partitionings — disagree in
    * the last bits. Here the five moments Σx, Σy, Σxy, Σx², Σy² are
    * decimal-exact (order-independent), and the textbook formula
    * (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) is evaluated in a
    * fixed double expression at the end — bit-identical on both engines,
    * at every cluster size, making correlation hash-gateable rather than
    * approximately-compared. */
  def corrPriceQty(spark: SparkSession, dir: String): DataFrame = {
    // Exact decimal moments via LONG-decomposed hundredths (r16, guide §1.2
    // step 2 / §2.3 narrower types): the previous formulation summed
    // products of DECIMAL(12,2) casts — Spark's Decimal.* routes every
    // row through java.math.BigDecimal, which made this one-pass
    // aggregation allocation-bound (7.9 s at sf1 for five decimal moments
    // over 6M rows). Both columns are exact hundredths, so each moment is
    // a plain BIGINT product sum in whole-stage codegen; the one sum whose
    // per-row terms reach 1.2e14 (Σ price²) is split div/mod 10⁶ so its
    // components stay exact to ~10¹² rows per group (the others bound at
    // n·5.5e10 ≤ 2⁶³ past 10⁸ rows per group and split the same way the
    // day they need to). The decimal values are reassembled from the
    // aggregated components on the 3 output rows — the identical exact
    // rational followed by the identical IEEE double cast, so the oracle
    // hash is unchanged (decimal cast rounding ≡ floor(x·100 + 0.5) on
    // non-negative hundredths data; the gate verifies it value-by-value).
    val qc = expr("cast(floor(l_quantity * 100 + 0.5d) as bigint)")
    val pc = expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)")
    def exactDouble(unscaled: Column, scale: Int): Column =
      (unscaled.cast(org.apache.spark.sql.types.DecimalType(38, 0)) /
        math.pow(10, scale).toLong).cast("double")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), qc.as("qc"), pc.as("pc"))
      .select(col("l_returnflag"), col("qc"), col("pc"),
        (col("pc") * col("pc")).as("pp"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qc")).as("sqc"),
        sum(col("pc")).as("spc"),
        sum(col("qc") * col("pc")).as("sqp"),
        sum(col("qc") * col("qc")).as("sqq"),
        sum(expr("pp div 1000000")).as("sppa"),
        sum(expr("pp % 1000000")).as("sppb"))
      .select(col("l_returnflag"), col("n"),
        exactDouble(col("sqc"), 2).as("sx"),
        exactDouble(col("spc"), 2).as("sy"),
        exactDouble(col("sqp"), 4).as("sxy"),
        exactDouble(col("sqq"), 4).as("sxx"),
        exactDouble(col("sppa").cast(
          org.apache.spark.sql.types.DecimalType(38, 0)) * 1000000L
          + col("sppb"), 4).as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Dispersion moments per group — sample variance and stddev — from the
    * same exact decimal moment sums [[corrPriceQty]] uses (n, Σx, Σx²):
    * built-in stddev_samp streams float partials whose accumulation order
    * is shuffle-dependent, so it can never hash-match a second engine;
    * one final double evaluation of exact sums can and does. */
  def dispersionQty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Long-decomposed exact moments, same discipline (and equivalence
    // argument) as [[corrPriceQty]]: Σqc and Σqc² fit BIGINT to ~10¹¹
    // rows per group (qc ≤ 5·10³), reassembled exactly on 3 rows.
    val qc = expr("cast(floor(l_quantity * 100 + 0.5d) as bigint)")
    def exactDouble(unscaled: Column, scale: Int): Column =
      (unscaled.cast(DecimalType(38, 0)) /
        math.pow(10, scale).toLong).cast("double")
    val varCol = (col("n") * col("sxx") - col("sx") * col("sx")) /
      (col("n").cast("double") * (col("n") - 1))
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), qc.as("qc"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qc")).as("sqc"),
        sum(col("qc") * col("qc")).as("sqq"))
      .select(col("l_returnflag"), col("n"),
        exactDouble(col("sqc"), 2).as("sx"),
        exactDouble(col("sqq"), 4).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        (col("sx") / col("n")).as("mean_qty"),
        varCol.as("var_qty"),
        sqrt(varCol).as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** Higher-moment shape statistics (population skewness and excess
    * kurtosis) from EXACT integer power sums — the natural extension of
    * [[dispersionQty]]: quantities are whole units (≤ 50, integral in
    * TPC-H — so Σq⁴ stays double-exact, see below), the four power sums
    * accumulate as DECIMAL(38,0) (overflow-proof at any scale, and
    * order-independent unlike built-in skewness/kurtosis, which stream
    * float partials), and the moment algebra is a fixed tree of IEEE
    * double ops spelled identically in the oracle. pow(m2, 1.5) is
    * deliberately written m2·sqrt(m2): sqrt and · are correctly rounded
    * everywhere, libm pow is not. */
  def skewKurtQty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    // Whole-unit quantities (≤ 50, integral in TPC-H), NOT cents: q⁴ ≤
    // 6.25e6, so every power sum stays below 2^53 through ~10⁹ rows per
    // group and the decimal→double cast is EXACT on both engines. The
    // earlier cents formulation pushed Σq⁴ past 2^63 at sf0.1, where
    // DuckDB's HUGEINT→DOUBLE cast (upper·2⁶⁴ + lower, two roundings) is
    // not correctly rounded and drifted ~50 ulps from Spark's BigDecimal
    // cast. Beyond ~10⁹ rows/group, bridge the cast through a decimal
    // string (strtod is correctly rounded everywhere) or split the sum.
    val q = col("l_quantity").cast("long")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), q.as("q"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        // r16: plain BIGINT power sums — the per-row long->DECIMAL(38)
        // casts fed Decimal-object accumulation for values the scaladoc
        // already bounds under 2^53 (the exact-cast envelope); long sums
        // are exact far beyond it and keep the aggregation in whole-stage
        // codegen. Same values, same final casts, hash unchanged.
        sum(col("q")).as("s1r"),
        sum(col("q") * col("q")).as("s2r"),
        sum(col("q") * col("q") * col("q")).as("s3r"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4r"))
      .select(col("l_returnflag"), col("n"),
        col("s1r").cast("double").as("sx"),
        col("s2r").cast("double").as("sxx"),
        col("s3r").cast("double").as("sx3"),
        col("s4r").cast("double").as("sx4"))
      .withColumn("m", col("sx") / col("n"))
      .withColumn("m2", col("sxx") / col("n") - col("m") * col("m"))
      .withColumn("m3", col("sx3") / col("n")
        - lit(3.0) * col("m") * (col("sxx") / col("n"))
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", col("sx4") / col("n")
        - lit(4.0) * col("m") * (col("sx3") / col("n"))
        + lit(6.0) * col("m") * col("m") * (col("sxx") / col("n"))
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .select(col("l_returnflag"), col("n"),
        col("m").as("mean_qty"), col("m2").as("m2_qty"),
        (col("m3") / (col("m2") * sqrt(col("m2")))).as("skew_qty"),
        (col("m4") / (col("m2") * col("m2")) - lit(3.0)).as("kurt_qty"))
      .orderBy("l_returnflag")
  }

  /** EXACT k-th smallest (here: the median, k = ceil(n/2)) by two-pass
    * bucket selection — the scale path for exact order statistics that a
    * global sort can't offer: pass 1 scans once building a 10k-bucket
    * histogram over [min, max]; the driver walks cumulative counts
    * (10k longs — metadata, not data) to find the bucket containing rank
    * k; pass 2 sorts ONLY that bucket's rows (n/10k of the data under any
    * non-degenerate distribution) and picks the remaining offset. Exact
    * for any distribution — degenerate buckets just make pass 2 bigger,
    * never wrong. The oracle computes the same order statistic via
    * ORDER BY LIMIT/OFFSET.
    *
    * Contrast: `agg_percentiles` (exact, per-group, built-in sort-based
    * percentile) and `sketch_approx_quantiles` (t-digest-style bounded
    * error); this is the third point on that design surface — exact AND
    * sort-free at scale. */
  def exactMedianTwoPass(spark: SparkSession, dir: String): DataFrame = {
    val buckets = 10000
    val vals = Tables.lineitem(spark, dir).select(col("l_extendedprice").as("v"))
    val Array(n, lo, hi) = vals
      .agg(count(lit(1)), min(col("v")), max(col("v")))
      .head().toSeq.map(_.toString).toArray
    val (nn, vlo, vhi) = (n.toLong, lo.toDouble, hi.toDouble)
    val k = (nn + 1) / 2 // rank of the lower median, 1-based
    val rawWidth = (vhi - vlo) / buckets
    val width = if (rawWidth == 0.0) 1.0 else rawWidth // constant column → all in bucket 0
    val bucketCol = least(
      floor((col("v") - lit(vlo)) / lit(width)).cast("int"), lit(buckets - 1))
    val hist = vals.groupBy(bucketCol.as("b"))
      .agg(count(lit(1)).as("c"))
      .orderBy("b")
      .collect().map(r => (r.getInt(0), r.getLong(1))) // ≤10k rows: metadata
    var cum = 0L
    var target = -1
    var before = 0L
    for ((b, c) <- hist if target < 0) {
      if (cum + c >= k) { target = b; before = cum }
      cum += c
    }
    val offset = (k - before - 1).toInt
    val median = vals
      .filter(bucketCol === target)
      .orderBy("v")
      .limit(offset + 1)
      .agg(max(col("v")).as("median"))
    median.select(col("median"), lit(nn).as("n_rows"))
  }

  /** EXACT weighted median: the smallest price v per return flag such that
    * the lineitems priced ≤ v carry at least half the total quantity mass.
    * Weighted order statistics are what "median price paid" actually means
    * when rows have multiplicity — the unweighted median answers a
    * different question on any skewed basket.
    *
    * Exactness discipline: weights are whole-number quantities cast to
    * BIGINT, folded by an exact windowed sum over values GROUPED BY v
    * first — collapsing duplicate values before the cumsum removes every
    * row-order ambiguity, so the `2·cum ≥ W` threshold is engine-
    * independent without any tiebreak column. The selected v itself is
    * never arithmetic'd. Scale: the per-flag sort runs over DISTINCT
    * prices (already aggregated), and the bucket-selection trick of
    * [[exactMedianTwoPass]] generalizes verbatim to weighted ranks when
    * even that sort is too big. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(sum(col("l_quantity").cast("bigint")).as("w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
    byVal
      .withColumn("cum", sum(col("w")).over(win))
      .withColumn("total_w", sum(col("w")).over(tot))
      .filter(col("cum") * 2 >= col("total_w"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("v")).as("weighted_median"),
        max(col("total_w")).as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** Count-min sketch, built exactly: 4 hash rows × 256 columns over the
    * event stream's user_ids, each row keyed by an independently-salted
    * portable hash. A CMS is DETERMINISTIC given its hash family — every
    * cell is an exact SUM, so unlike HLL/t-digest (whose internals are
    * engine-private, see [[sketchDistinct]]) the whole sketch table is
    * hash-gated against the oracle. Construction is one groupBy over
    * (row, column) pairs — partial-aggregated map-side, mergeable across
    * partitions/days by cell-wise addition, which is the whole point of a
    * CMS at 100 TB: frequency estimates for any user in 4 KB of state. */
  def cmsUsers(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    // one scan: each event explodes into its 4 (row, column) cells — not a
    // 4-way union of full scans, which would read the stream 4 times
    Tables.events(spark, dir)
      .select(explode(expr(
        // r16: unrolled 4-element array — transform(sequence) lambdas are
        // CodegenFallback and this ran interpreted per event row; the
        // explicit array of named_structs is whole-stage codegen with
        // identical values (same hash inputs, int literals for r).
        (0 until 4).map(r => s"named_struct('r', $r, " +
          s"'c', portable_hash60(concat('cms', $r, ':', cast(user_id as string))) % 256)")
          .mkString("array(", ", ", ")"))).as("x"))
      .select(col("x.r").as("sketch_row"), col("x.c").as("sketch_col"))
      .groupBy("sketch_row", "sketch_col")
      .agg(count(lit(1)).as("cell_count"))
      .orderBy("sketch_row", "sketch_col")
  }

  /** Bloom filter, built and probed exactly: a 1024-bit / 4-hash filter
    * over "customers who ordered in 1996Q1", stored as 32 32-bit words (BIGINT lanes — DuckDB forbids 1<<63)
    * built by one `bit_or` aggregation, then probed by the full customer
    * dimension with exact false-positive accounting. Like the CMS
    * ([[cmsUsers]]), a Bloom filter is deterministic given its hash
    * family, so filter content AND the probe outcome are hash-gated —
    * the structure Spark itself builds for runtime-filter semi-join
    * pushdown, here as a first-class queryable artifact. The 32-word
    * bitmap is broadcast to the probe side; build and probe are each one
    * scan + one tiny aggregation. */
  def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    val members = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_custkey").as("k")).distinct()
    def positions(df: DataFrame): DataFrame = df
      .select(col("k"), explode(expr(
        // r16: unrolled, same reason as the CMS cells above
        (0 until 4).map(r =>
          s"portable_hash60(concat('bloom', $r, ':', cast(k as string))) % 1024")
          .mkString("array(", ", ", ")"))).as("pos"))
      .select(col("k"), expr("pos div 32").as("word"), expr("pos % 32").as("bit"))
    val bitmap = positions(members)
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))").as("wv"))
    val probe = positions(
      Tables.customer(spark, dir).select(col("c_custkey").as("k")))
      .join(broadcast(bitmap), Seq("word"), "left")
      .withColumn("hit",
        expr("cast((shiftright(coalesce(wv, cast(0 as bigint)), cast(bit as int)) & 1) as bigint)"))
      .groupBy(col("k"))
      .agg(min(col("hit")).as("maybe"))
    probe
      .join(members.withColumn("is_member", lit(1L)), Seq("k"), "left")
      .withColumn("is_member", coalesce(col("is_member"), lit(0L)))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("is_member")).as("n_members"),
        sum(col("maybe")).as("n_maybe"),
        sum(when(col("maybe") === 1L && col("is_member") === 0L, 1L)
          .otherwise(0L)).as("n_false_pos"))
      .withColumn("fp_rate",
        col("n_false_pos").cast("double") /
          (col("n_customers") - col("n_members")))
  }

  /** Sketch aggregates — the sublinear-memory path for 100 TB cardinality
    * and quantile estimation: HyperLogLog++ distinct counts and t-digest
    * style approximate percentiles. Sketch INTERNALS are engine-private
    * (another engine cannot reproduce the estimate bit-for-bit), so these
    * two gate themselves: the sketch runs for real, its estimate is checked
    * against the exactly-computed answer INSIDE the query, and the output
    * carries only exact columns plus the error-bound boolean — every column
    * is oracle-hashable, and a sketch drifting out of its accuracy contract
    * flips the boolean and fails the gate. (Same self-check shape as
    * [[hllEstimate]]'s rel_err_pct, adapted to engine-private sketches.) */
  def sketchDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      // rsd 0.02 → gate at 5× the target standard error; deterministic for
      // fixed data, so this is a stable hard gate, not a flaky one
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users").cast("double") - col("exact_users").cast("double"))
          <= col("exact_users").cast("double") * lit(0.10)).as("within_10pct"))
      .orderBy("event_type")

  /** approx_percentile(accuracy=1000) guarantees rank error ≤ n/1000, i.e.
    * the estimate lies between the exact order statistics at p ± 0.001;
    * the gate checks the 10× looser p ± 0.01 band. Output columns are the
    * exact count + three band booleans — all oracle-hashable.
    *
    * The exact band edges come from an AGGREGATED cumulative histogram
    * (groupBy (flag, price) with map-side partial aggregation, then a
    * window cumsum over the ~distinct-values-sized result), not from the
    * exact `percentile` aggregate: `percentile` materializes a per-group
    * value→count map in executor memory — the same value-domain-
    * proportional state this repo already evicted from quantileBins — and
    * was also the single slowest bench query (14 s at sf0.1) when used
    * here. Band edges are order statistics at exact integer ranks
    * floor(q·n)∨1 and ceil(q·n)∧n, which bound the sketch's rank
    * guarantee for every n. */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val approx = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 1000)")
          .as("ap"),
        count(lit(1)).as("n_rows"))
    val byV = Window.partitionBy("l_returnflag").orderBy("v")
    val whole = Window.partitionBy("l_returnflag")
    val cum = li.groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("hi", sum(col("c")).over(byV))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", sum(col("c")).over(whole))
    // exactly one histogram row's [lo, hi] rank span covers each target
    // rank, so the conditional max picks that row's value
    val boundCols = Seq(
      ("lo50", 49, true), ("hi50", 51, false), ("lo95", 94, true),
      ("hi95", 96, false), ("lo99", 98, true), ("hi99", 100, false)
    ).map { case (nm, q100, isLower) =>
      val rank =
        if (isLower) greatest(lit(1L), expr(s"($q100 * n) div 100"))
        else least(col("n"), expr(s"($q100 * n + 99) div 100"))
      max(when(rank.between(col("lo"), col("hi")), col("v"))).as(nm)
    }
    val bounds = cum.groupBy("l_returnflag")
      .agg(boundCols.head, boundCols.tail: _*)
    approx.join(bounds, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"),
        (element_at(col("ap"), 1) >= col("lo50") &&
          element_at(col("ap"), 1) <= col("hi50")).as("ok50"),
        (element_at(col("ap"), 2) >= col("lo95") &&
          element_at(col("ap"), 2) <= col("hi95")).as("ok95"),
        (element_at(col("ap"), 3) >= col("lo99") &&
          element_at(col("ap"), 3) <= col("hi99")).as("ok99"))
      .orderBy("l_returnflag")
  }

  /** Queries with no SQL-expressible cross-engine oracle. Empty since round
    * 6: the two engine-private sketches became self-checking (estimate
    * validated against the exact answer in-query, only exact columns +
    * error-bound booleans shipped), so every entry carries a hard gate. */
  val rowsOnly: Set[String] = Set.empty

  /** Fixed-width numeric histogram of lineitem prices (20 buckets of
    * 5000): one partial-aggregated scan, bucket = floor division in double
    * space (identical IEEE result in both engines), top bucket clamped.
    * The poor-man's `width_bucket` — DuckDB lacks the function, so both
    * sides compute the same arithmetic directly. */
  def histogramPrices(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(least(floor(col("l_extendedprice") / 5000.0), lit(19L))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        // r16: exact cents sum in codegen longs, reassembled to the same
        // decimal value (and the same IEEE double) on the 20 output rows
        sum(cents(col("l_extendedprice"))).as("spc"))
      .select(col("bucket"), col("n"),
        (col("spc").cast(DecimalType(38, 0)) / 100).cast("double")
          .as("sum_price"))
      .orderBy("bucket")

  /** Boolean/conditional aggregate surface: count_if / bool_and (every) /
    * bool_or (any) per group — all order-independent, so exactly
    * hash-gateable with no decimal machinery. */
  def boolStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("count_if(o_totalprice > 150000)").as("n_big"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_orderstatus = 'F')").as("any_final"),
        expr("count_if(o_orderstatus = 'O' and o_totalprice < 50000)")
          .as("n_small_open"))
      .orderBy("o_orderpriority")

  /** Ordered string aggregation (SQL LISTAGG): nation names per region as
    * a sorted CSV. Spark composes it as collect_list → array_sort →
    * array_join, which keeps the aggregation order-INDEPENDENT (the sort
    * canonicalizes whatever arrival order the shuffle produced) — the only
    * way a concatenation aggregate can be deterministic on a cluster.
    * Bounded output per group (listagg of an unbounded group is an OOM at
    * scale regardless of engine — this one is dimension-sized). */
  def stringAggNations(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations_csv"))
      .orderBy("r_name")

  /** Exact MODE with a deterministic tiebreak (max count, then min value)
    * — built-in `mode()` is tie-nondeterministic on both engines, so the
    * operator is spelled as count-then-rank: one hash aggregation on the
    * (status, priority) pair, then a window over the per-status counts.
    * The windowed input is already aggregated (|statuses|×|priorities|
    * rows), so the rank pass is negligible at any scale. */
  def modePriority(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("cnt").desc, col("o_orderpriority"))))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"),
        col("cnt").as("mode_count"))
      .orderBy("o_orderstatus")
  }

  /** Per-user OLS trend of event value over time — closed-form simple
    * linear regression from EXACT integer sums (built-in regr_slope
    * streams float partials and can never hash-match a second engine).
    * x = seconds since the user's first event (windowed min — keeps the
    * products small), y = integer cents; Σx, Σy, Σxy, Σx² accumulate as
    * DECIMAL(38,0) and the slope/intercept algebra is a fixed IEEE tree
    * spelled identically in the oracle. Degenerate users (all events in
    * one second) yield NULL. One user_id window + one user_id hash agg. */
  def olsTrend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("es"),
        cents(col("value")).as("cents"))
      .withColumn("x",
        col("es") - min(col("es")).over(Window.partitionBy(col("user_id"))))
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / denom
    base.groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sxr"),
        sum(col("cents").cast(d38)).as("syr"),
        sum((col("x") * col("cents")).cast(d38)).as("sxyr"),
        sum((col("x") * col("x")).cast(d38)).as("sxxr"))
      .select(col("user_id"), col("n"),
        col("sxr").cast("double").as("sx"),
        col("syr").cast("double").as("sy"),
        col("sxyr").cast("double").as("sxy"),
        col("sxxr").cast("double").as("sxx"))
      .select(col("user_id"), col("n"),
        when(denom > 0.0, slope).as("slope_cents_per_s"),
        when(denom > 0.0,
          (col("sy") - slope * col("sx")) / col("n")).as("intercept_cents"))
      .orderBy("user_id")
  }

  /** HyperLogLog built EXACTLY: the register table of a 64-register
    * (p = 6) HLL over the event stream's users, keyed by the engine's
    * portable md5-derived 60-bit hash. Register = top 6 hash bits; rank =
    * leading-zero count of the remaining 54-bit field plus one (via the
    * binary-string length of `bin()`, which both engines define
    * identically). Unlike the engine-private HLL++ in [[sketchDistinct]],
    * every register value here is a deterministic MAX, so the whole sketch
    * is hash-gated against the oracle — the same trick that makes
    * [[cmsUsers]] gateable.
    *
    * Scale: max is idempotent, so NO distinct pass over users is needed —
    * one scan, partial-aggregated map-side into at most 64 groups. That is
    * the entire point of an HLL at 100 TB: the shuffle carries ≤64 rows
    * per partition no matter how many events feed it, and region-level
    * sketches merge by register-wise MAX. */
  def hllRegisters(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    spark.range(64).select(col("id").as("register"))
      .join(hllRegisterAgg(spark, dir), Seq("register"), "left")
      .select(col("register"),
        coalesce(col("max_rank"), lit(0)).as("max_rank"))
      .orderBy("register")
  }

  /** Shared register aggregation for [[hllRegisters]]/[[hllEstimate]]:
    * (register, max rank) pairs for registers that saw at least one hash. */
  private def hllRegisterAgg(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    Tables.events(spark, dir)
      .select(expr("portable_hash60(concat('hll:', cast(user_id as string)))")
        .as("h"))
      // 2^54 splits the 60-bit hash: top 6 bits = register, low 54 = rank field
      .select(expr("h div 18014398509481984").as("register"),
        expr("h % 18014398509481984").as("rem"))
      .select(col("register"),
        when(col("rem") === 0L, lit(55))
          .otherwise(lit(55) - length(bin(col("rem")))).cast("int").as("rnk"))
      .groupBy("register")
      .agg(max(col("rnk")).as("max_rank"))
  }

  /** HLL MERGEABILITY — the property that makes sketches worth shipping
    * at 100 TB: per-shard register tables (here one shard per event
    * type, the "per-region sketch" shape) merge by register-wise MAX
    * into exactly the sketch a direct global pass builds. The query
    * materializes both sides — merged-from-5-shards vs direct — plus
    * the equality flag, and the oracle recomputes all three: a merge
    * bug (wrong max, lost register, shard skew) flips a row and fails
    * the hash gate. Scale: each shard aggregation is ≤64 rows out of a
    * partial-aggregated scan; the merge shuffles ≤ shards·64 rows. */
  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    val shard = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("portable_hash60(concat('hll:', cast(user_id as string)))").as("h"))
      .select(col("event_type"),
        expr("h div 18014398509481984").as("register"),
        expr("h % 18014398509481984").as("rem"))
      .select(col("event_type"), col("register"),
        when(col("rem") === 0L, lit(55))
          .otherwise(lit(55) - length(bin(col("rem")))).cast("int").as("rnk"))
      .groupBy("event_type", "register")
      .agg(max(col("rnk")).as("mr"))
    val merged = shard.groupBy("register")
      .agg(count(lit(1)).as("n_shards"), max(col("mr")).as("merged_max_rank"))
    spark.range(64).select(col("id").as("register"))
      .join(merged, Seq("register"), "left")
      .join(hllRegisterAgg(spark, dir), Seq("register"), "left")
      .select(col("register"),
        coalesce(col("n_shards"), lit(0L)).as("n_shards"),
        coalesce(col("merged_max_rank"), lit(0)).as("merged_max_rank"),
        coalesce(col("max_rank"), lit(0)).as("direct_max_rank"))
      .withColumn("is_equal",
        (col("merged_max_rank") === col("direct_max_rank")).cast("int"))
      .orderBy("register")
  }

  /** HLL audience-OVERLAP estimation via inclusion-exclusion — the
    * second half of the mergeability story [[hllMerge]] proves: sketches
    * support union natively (register-wise MAX), so the intersection of
    * two audiences estimates as |A| + |B| − |A∪B| without ever touching
    * raw membership — the cross-product/audience-overlap query every
    * marketing and dedup-planning stack runs on sketches precisely
    * because exact intersection over 100 TB requires a full co-group.
    * Audiences here are campaign touchers (props.k = 1 vs k = 2, which
    * genuinely partially overlap in the corpus). All three harmonic
    * denominators are exact BIGINTs (Σ 2^(55−M_j) + zeros·2^55), every
    * estimate is ONE double division of exact operands, and the
    * inclusion-exclusion combination keeps identical operand order in
    * both engines, so even the float columns hash-gate; exact distinct
    * counts ride along so the estimator's accuracy is itself checked. */
  def hllIntersection(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    val ev = Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("user_id"))
      .filter(col("k").isin(1, 2))
    val base = ev
      .select(col("k"),
        expr("portable_hash60(concat('hll:', cast(user_id as string)))").as("h"))
      .select(col("k"),
        expr("h div 18014398509481984").as("register"),
        expr("h % 18014398509481984").as("rem"))
      .select(col("k"), col("register"),
        when(col("rem") === 0L, lit(55))
          .otherwise(lit(55) - length(bin(col("rem")))).cast("int").as("rnk"))
    val perK = base.groupBy("k", "register").agg(max(col("rnk")).as("mr"))
    val unionRegs = perK.groupBy("register").agg(max(col("mr")).as("mr"))
    def harm(df: DataFrame, name: String): DataFrame =
      df.agg((sum(expr("shiftleft(cast(1 as bigint), cast(55 - mr as int))"))
        + (lit(64L) - count(lit(1))) * lit(36028797018963968L)).as(name))
    val ha = harm(perK.filter(col("k") === 1), "ha")
    val hb = harm(perK.filter(col("k") === 2), "hb")
    val hu = harm(unionRegs, "hu")
    val exact = ev.groupBy("user_id")
      .agg(countDistinct(col("k")).as("nk"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("nk") === 2, 1L).otherwise(0L)).as("exact_intersection"))
    val c = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16)
    ha.crossJoin(hb).crossJoin(hu).crossJoin(broadcast(exact))
      .withColumn("est_a", c / col("ha").cast("double"))
      .withColumn("est_b", c / col("hb").cast("double"))
      .withColumn("est_union", c / col("hu").cast("double"))
      .withColumn("est_intersection",
        (col("est_a") + col("est_b")) - col("est_union"))
      .select(col("ha"), col("hb"), col("hu"),
        col("est_a"), col("est_b"), col("est_union"), col("est_intersection"),
        col("exact_union"), col("exact_intersection"))
  }

  /** The HLL cardinality estimate from [[hllRegisters]]' register table,
    * computed without a single nondeterministic float: the harmonic
    * denominator Σ 2^-M_j is carried as the exact integer Σ 2^(55-M_j)
    * (common denominator 2^55 — every term is a BIGINT power of two), and
    * the raw estimate α·m²·2^55 / harmonic_num is ONE double division of
    * exact operands. exact_distinct and the relative error ride along so
    * the sketch's accuracy claim is itself oracle-checked. */
  def hllEstimate(spark: SparkSession, dir: String): DataFrame = {
    val regs = spark.range(64).select(col("id").as("register"))
      .join(hllRegisterAgg(spark, dir), Seq("register"), "left")
      .select(coalesce(col("max_rank"), lit(0)).as("m_j"))
    val summary = regs.agg(
      count(lit(1)).as("m"),
      sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("n_zero"),
      sum(expr("shiftleft(cast(1 as bigint), cast(55 - m_j as int))"))
        .as("harmonic_num"))
    val exact = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    summary.crossJoin(exact)
      .withColumn("estimate_raw",
        lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16)
          / col("harmonic_num").cast("double"))
      .withColumn("rel_err_pct",
        (col("estimate_raw") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double") * lit(100.0))
      .select(col("m"), col("n_zero"), col("harmonic_num"),
        col("estimate_raw"), col("exact_distinct"), col("rel_err_pct"))
  }

  /** Mann-Kendall trend test over each return flag's monthly revenue
    * series — the nonparametric "is this metric trending" statistic, and
    * unlike OLS it is EXACT end-to-end: S = Σ sign(rev_j − rev_i) over all
    * i<j month pairs (integer cents comparisons), and the variance ships
    * as the integer 18·Var[S] = n(n−1)(2n+5) − Σ t(t−1)(2t+5) with the
    * exact tie correction. No float appears in any column.
    *
    * Scale: the O(T²) pair join runs on the AGGREGATED monthly series
    * (time-bounded: T months per flag, not data-proportional), after one
    * partial-aggregated shuffle of lineitem on (flag, month). The series
    * side is broadcast. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val series = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev"))
    val pairs = series.select(col("l_returnflag"), col("mon").as("m1"), col("rev").as("r1"))
      .join(broadcast(series.select(col("l_returnflag"), col("mon").as("m2"), col("rev").as("r2"))),
        Seq("l_returnflag"))
      .filter(col("m1") < col("m2"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("r2") > col("r1"), 1L)
        .when(col("r2") < col("r1"), -1L).otherwise(0L)).as("s_stat"))
    val ties = series.groupBy(col("l_returnflag"), col("rev"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("t")).as("n_months"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"))
    ties.join(pairs, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_months"), col("s_stat"),
        (col("n_months") * (col("n_months") - 1) * (col("n_months") * 2 + 5)
          - col("tie_term")).as("var_s_x18"),
        when(col("s_stat") > 0, "increasing")
          .when(col("s_stat") < 0, "decreasing")
          .otherwise("none").as("trend"))
      .orderBy("l_returnflag")
  }

  /** Benford first-digit audit of lineitem prices — the classic
    * fraud/data-quality screen. The leading digit comes from the DECIMAL
    * cents rendered as a string (never from log10, whose boundary cases
    * are engine-dependent); shares are one division per digit over the
    * broadcast total. One partial-aggregated scan into ≤9 groups. */
  def benfordPrices(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.lineitem(spark, dir)
      .select(substring(cents(col("l_extendedprice")).cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    digits.crossJoin(broadcast(digits.agg(sum(col("n")).as("total"))))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"))
      .orderBy("digit")
  }

  /** End-to-end CMS usage: probe the [[cmsUsers]] sketch for the exact
    * top-10 users and report estimated vs true counts — the
    * "frequency of a heavy hitter from 4 KB of state" workflow, with the
    * overestimate (always ≥ 0 for a CMS) exact-checked per user. The
    * candidate set comes from a TakeOrdered top-k (never a global sort);
    * the 1024-cell sketch joins in as a broadcast; est = MIN over the 4
    * probed cells. */
  def cmsTopkProbe(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    val cells = Tables.events(spark, dir)
      .select(explode(expr(
        // r16: unrolled 4-element array — transform(sequence) lambdas are
        // CodegenFallback and this ran interpreted per event row; the
        // explicit array of named_structs is whole-stage codegen with
        // identical values (same hash inputs, int literals for r).
        (0 until 4).map(r => s"named_struct('r', $r, " +
          s"'c', portable_hash60(concat('cms', $r, ':', cast(user_id as string))) % 256)")
          .mkString("array(", ", ", ")"))).as("x"))
      .select(col("x.r").as("r"), col("x.c").as("c"))
      .groupBy("r", "c")
      .agg(count(lit(1)).as("cell_count"))
    val top = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(10)
    top
      .select(col("user_id"), col("exact_n"), explode(expr(
        // r16: unrolled 4-element array — transform(sequence) lambdas are
        // CodegenFallback and this ran interpreted per event row; the
        // explicit array of named_structs is whole-stage codegen with
        // identical values (same hash inputs, int literals for r).
        (0 until 4).map(r => s"named_struct('r', $r, " +
          s"'c', portable_hash60(concat('cms', $r, ':', cast(user_id as string))) % 256)")
          .mkString("array(", ", ", ")"))).as("x"))
      .join(broadcast(cells),
        col("x.r") === col("r") && col("x.c") === col("c"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("cell_count")).as("cms_est"))
      .select(col("user_id"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overestimate"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  /** EXACT equi-depth decile boundaries of price per return flag — the
    * full-detail counterpart of [[sketchQuantiles]]' t-digest estimates:
    * boundary d (d = 1..9) is the smallest price whose cumulative row
    * count reaches d·n/10, read off the per-(flag, price) AGGREGATED
    * cumulative histogram (the [[weightedMedian]] machinery generalized
    * to all nine cuts at once via one `sequence(1,9)` explode). Windows
    * partition by flag; the explode runs over distinct prices, not rows. */
  def equidepthDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col("l_returnflag")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("l_returnflag"))
    byVal
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(totW))
      .select(col("l_returnflag"), col("v"), col("cum"), col("n"),
        explode(expr("sequence(1, 9)")).as("d"))
      .filter(col("cum") * 10 >= col("d") * col("n"))
      .groupBy(col("l_returnflag"), col("d"))
      .agg(min(col("v")).as("boundary"), max(col("n")).as("n_rows"))
      .orderBy("l_returnflag", "d")
  }

  /** Lag-1 autocorrelation of monthly revenue per return flag — the
    * "is this series momentum or noise" statistic. Pairs come from one
    * lag over the (flag; month) partition of the AGGREGATED series. The
    * series is quantized to whole thousand-dollar units FIRST (Pearson r
    * is unit-invariant; the quantization is deterministic) so every
    * moment sum stays far below 2^53 — DuckDB's HUGEINT→DOUBLE cast is
    * not correctly rounded past 2^63, so keeping the integers small is
    * what makes the doubles engine-exact. The formula tree (including
    * the correctly-rounded-by-definition sqrt) is spelled identically in
    * the oracle. */
  def autocorrRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("mon"))
    val pairs = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(sum(cents(col("l_extendedprice"))).as("cents"))
      .select(col("l_returnflag"), col("mon"),
        expr("cents div 100000").as("x"))
      .withColumn("y", lag(col("x"), 1).over(w))
      .filter(col("y").isNotNull)
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
      * (col("n") * col("syy") - col("sy") * col("sy")))
    pairs.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("x")).as("sxl"), sum(col("y")).as("syl"),
        sum(col("x") * col("y")).as("sxyl"),
        sum(col("x") * col("x")).as("sxxl"),
        sum(col("y") * col("y")).as("syyl"))
      .select(col("l_returnflag"), col("cnt").as("n_pairs"),
        col("cnt").cast("double").as("n"),
        col("sxl").cast("double").as("sx"), col("syl").cast("double").as("sy"),
        col("sxyl").cast("double").as("sxy"),
        col("sxxl").cast("double").as("sxx"),
        col("syyl").cast("double").as("syy"))
      .select(col("l_returnflag"), col("n_pairs"),
        when(den > 0.0, num / den).as("autocorr_r1"))
      .orderBy("l_returnflag")
  }

  /** Tukey-fence outlier census per return flag: fences are the exact
    * interpolated quartiles ± 1.5·IQR (both engines share the same
    * percentile definition and the fence arithmetic is a fixed IEEE
    * tree), counts are exact. Two passes: a tiny per-flag fence
    * aggregation broadcast back onto one counting scan. */
  def tukeyOutliers(spark: SparkSession, dir: String): DataFrame = {
    val fences = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.75))").as("q"))
      .select(col("l_returnflag"),
        element_at(col("q"), 1).as("p25"), element_at(col("q"), 2).as("p75"))
      .withColumn("lo", col("p25") - lit(1.5) * (col("p75") - col("p25")))
      .withColumn("hi", col("p75") + lit(1.5) * (col("p75") - col("p25")))
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
      .join(broadcast(fences), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("p25")).as("p25"), max(col("p75")).as("p75"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_high"))
      .orderBy("l_returnflag")
  }

  /** Market-basket association mining over orders: support, directional
    * confidence, and lift for brand pairs co-purchased in one order — the
    * canonical A-priori single-level report. Baskets collapse to DISTINCT
    * (order, brand) first (the only pass over lineitem); pairs come from
    * a self-join on the order key (co-partitioned — both sides are the
    * same shuffle output) with `a < b` dedup; support/counts are exact
    * integers, confidence and lift are single divisions with the lift
    * numerator cross-multiplied (`support·N` vs `cnt_a·cnt_b`). A
    * min-support floor keeps the output association-worthy (and the
    * pair explosion bounded — at 100 TB one adds a frequent-item
    * pre-filter, the A-priori property, which this HAVING is). */
  def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val n = items.select(countDistinct(col("okey")).as("n_baskets"))
    val cnt = items.groupBy(col("brand")).agg(count(lit(1)).as("cnt"))
    val pairs = items.select(col("okey"), col("brand").as("brand_a"))
      .join(items.select(col("okey"), col("brand").as("brand_b")), Seq("okey"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 20)
    pairs
      .join(broadcast(cnt.select(col("brand").as("brand_a"), col("cnt").as("cnt_a"))), Seq("brand_a"))
      .join(broadcast(cnt.select(col("brand").as("brand_b"), col("cnt").as("cnt_b"))), Seq("brand_b"))
      .crossJoin(broadcast(n))
      .select(col("brand_a"), col("brand_b"), col("support"),
        col("cnt_a"), col("cnt_b"),
        (col("support").cast("double") / col("cnt_a").cast("double")).as("conf_a_to_b"),
        (col("support").cast("double") / col("cnt_b").cast("double")).as("conf_b_to_a"),
        ((col("support") * col("n_baskets")).cast("double")
          / (col("cnt_a") * col("cnt_b")).cast("double")).as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  /** Deterministic ARGMAX / ARGMIN per group — "which order carried the
    * extreme price" — via lexicographic extremes: `lex_max(v, -key)` ties
    * break toward the SMALLEST key on both extremes, where the built-in
    * max_by/arg_max is tie-nondeterministic on every engine. One hash
    * aggregation. The native [[graft.functions.LexExtreme]] keeps the
    * (double, long) state in two MUTABLE buffer slots — the earlier
    * `max(struct(v, -key))` formulation computed the same values but the
    * immutable struct buffer forced the whole aggregation onto
    * interpreted SortAggregate (r15 verdict item 2; same values, so the
    * gate hash is unchanged). */
  def argExtremes(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("lex_max(o_totalprice, -o_orderkey)").as("mx"),
        expr("lex_min(o_totalprice, o_orderkey)").as("mn"))
      .select(col("o_orderpriority"),
        col("mx.a").as("max_price"), (-col("mx.b")).as("max_price_orderkey"),
        col("mn.a").as("min_price"), col("mn.b").as("min_price_orderkey"))
      .orderBy("o_orderpriority")
  }

  /** Pearson chi-square test of independence between `event_type` and ISO
    * day-of-week — the distribution-drift / feature-dependence check a
    * pipeline runs before trusting a categorical split. Per contingency
    * cell: observed `o`, row total `r`, column total `c`, grand total `n`,
    * the exact cross-multiplied deviation `dev = o·n − r·c`, and the cell's
    * chi-square contribution in exact micro-units
    * `chi2_micro = ⌊dev²·10⁶ / (n·r·c)⌋` — dev² runs in DECIMAL(38,0) so
    * nothing ever rounds, and the floor division makes every cell (and
    * therefore the total statistic Σcells, derivable by the consumer) a
    * pure integer that hash-matches across engines; a float Σ(o−e)²/e can
    * never be gated because summation order differs. One scan, one
    * R×C-cell aggregate, two tiny broadcast margins — no shape that grows
    * with data beyond the R×C cell table.
    *
    * Exactness bound: dev²·10⁶ must fit DECIMAL(38,0), i.e. |dev| ≤ ~3e15,
    * and |dev| = |o·n − r·c| can approach n² — so the exact path holds to
    * n ≈ 5e7 events per contingency table (beyond it, non-ANSI Spark
    * returns NULL chi2_micro rather than a wrong value, and DuckDB's
    * HUGEINT keeps going — the gate would catch the divergence). For
    * larger n, divide dev and n by g = gcd(dev, n·r·c) first or compute
    * per-cell on a uniform row sample; the statistic's scale is the
    * caller's to choose before the decimal width binds. */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), ((dayofweek(col("ts")) + 5) % 7 + 1).as("iso_dow"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
    val cols = cells.groupBy("iso_dow").agg(sum(col("o")).as("c"))
    val tot  = cells.agg(sum(col("o")).as("n"))
    cells
      .join(broadcast(rows), "event_type")
      .join(broadcast(cols), "iso_dow")
      .crossJoin(broadcast(tot))
      .withColumn("dev", col("o") * col("n") - col("r") * col("c"))
      .select(col("event_type"), col("iso_dow"), col("o"), col("r"), col("c"),
        col("n"), col("dev"),
        expr("""cast((cast(dev as decimal(38,0)) * cast(dev as decimal(38,0))
               |      * 1000000) div (cast(n as decimal(38,0)) * r * c)
               |  as bigint)""".stripMargin).as("chi2_micro"))
      .orderBy("event_type", "iso_dow")
  }

  /** Poisson(1) inverse-CDF thresholds at 60-bit scale: ⌊cdf_k·2⁶⁰⌋ for
    * k = 0..6 (weight caps at 7). Fixed integer constants shared verbatim
    * with the oracle, so the bootstrap weights are portable by
    * construction — no engine ever evaluates e⁻¹ at runtime. */
  private val PoissonThresholds: Seq[Long] = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
    1152825534095764625L)

  /** Splitmix-style 60-bit per-replicate mixer: uniform over [0, 2⁶⁰)
    * from a per-row portable hash `h` and replicate index `b`. The two
    * odd-constant multiplications run mod 2⁶⁰; on the Spark (hot-path)
    * side each is a 30/30-bit SPLIT product — v·C mod 2⁶⁰ =
    * ((a·c0 + b·c1 mod 2³⁰)·2³⁰ + b·c0) mod 2⁶⁰ for v = a·2³⁰ + b,
    * C ≡ c1·2³⁰ + c0 (mod 2⁶⁰) — keeping every intermediate under 2⁶¹,
    * so the whole mix stays in ANSI-safe codegen'd BIGINT ops (a first
    * cut in DECIMAL(38,0) was exact but 3× slower than the md5 it
    * replaced; the split form is pure long arithmetic). The DuckDB
    * oracle computes the identical value through DECIMAL mod
    * ([[mix60Duck]]) — deliberately a different formulation, so the gate
    * cross-checks the modular algebra. Statistical validation lives in
    * the [[bootstrapCi]] scaladoc. */
  private def mix60Sql(h: String, b: String): String = {
    val m60 = "1152921504606846975" // 2^60 - 1
    val m30 = "1073741823"          // 2^30 - 1
    def mulmod(v: String, c1: Long, c0: Long): String = {
      val a = s"shiftright($v, 30)"
      val bl = s"($v & $m30)"
      val t = s"((($a * $c0 + $bl * $c1) & $m30))"
      s"((shiftleft($t, 30) + $bl * $c0) & $m60)"
    }
    val v0 = s"($h ^ (cast($b as bigint) * 4503599627370449))"
    val v1 = mulmod(v0, 558354613L, 211124013L)   // ·6364136223846793005 mod 2^60
    val v2 = s"($v1 ^ shiftright($v1, 29))"
    val v3 = mulmod(v2, 353882693L, 258792733L)   // ·2685821657736338717 mod 2^60
    s"($v3 ^ shiftright($v3, 32))"
  }

  /** DuckDB rendering of [[mix60Sql]] (xor is a function there, shifts
    * are operators). */
  private def mix60Duck(h: String, b: String): String = {
    val mod = "1152921504606846976"
    val v0 = s"xor($h, CAST($b AS BIGINT) * 4503599627370449)"
    val v1 = s"CAST((CAST($v0 AS DECIMAL(38,0)) * 6364136223846793005) % $mod AS BIGINT)"
    val v2 = s"xor($v1, $v1 >> 29)"
    val v3 = s"CAST((CAST($v2 AS DECIMAL(38,0)) * 2685821657736338717) % $mod AS BIGINT)"
    s"xor($v3, $v3 >> 32)"
  }

  /** Distributed POISSON BOOTSTRAP confidence intervals (Chamandy et al.,
    * Google 2012) for the mean event value per type: row i's weight in
    * replicate b is Poisson(1)-distributed, derived deterministically as
    * the number of [[PoissonThresholds]] ≤ mix(h_i, b) — the
    * resample-with-replacement scheme that needs NO shared RNG state and
    * never materializes a resample (the classic n·B explode is one
    * map-side flatMap; partial aggregation collapses it to G·B partial
    * rows before the shuffle, so 100 replicates cost one wide pass, not
    * 100 scans). The expensive md5-based portable hash runs ONCE PER ROW
    * (h_i = portable_hash60("boot:i")); each replicate derives its
    * uniform via [[mix60Sql]], a splitmix-style 60-bit finalizer of
    * (h_i XOR b·prime) — two multiply-mod-2⁶⁰ rounds (exact DECIMAL(38,0)
    * arithmetic in both engines) with xor-shifts between. This is how
    * production Poisson bootstrap is deployed (hash once, cheap
    * per-replicate mixing): the round-9 form hashed md5 per (row,
    * replicate) — 100× the md5 work for identical statistics (mixer
    * validated against Poisson(1): weight pmf matches to 3 decimals and
    * the replicate-mean spread matches the iid expectation, 0.0066 vs
    * 0.0071 at n = 20k). Replicate means divide exact BIGINT cent sums
    * once; the 95% CI takes the 3rd/98th order statistics of the 100
    * sorted replicate means (nearest-rank 2.5%/97.5%) — exact order
    * stats over bit-identical doubles, so the whole CI is hash-gateable. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        cents(col("value")).as("cents"))
    val base = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
    // The weight is a sum of 7 plain comparisons, NOT size(filter(...)):
    // higher-order array functions are CodegenFallback, and one in the
    // n·B hot path dropped the whole 10M-row stage out of whole-stage
    // codegen (measured 30s → ~2s at sf0.1 for this query).
    val weight = PoissonThresholds
      .map(t => when(col("u") >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _)
    val means = ev
      .withColumn("h", expr(
        "portable_hash60(concat('boot:', cast(event_id as string)))"))
      .withColumn("b", explode(sequence(lit(0), lit(99))))
      .withColumn("u", expr(mix60Sql("h", "b")))
      .withColumn("w", weight)
      .groupBy("event_type", "b")
      .agg(sum(col("w") * col("cents")).as("swc"), sum(col("w")).as("sw"))
      .select(col("event_type"), col("b"),
        (col("swc").cast("double") / col("sw").cast("double")).as("m"))
    means.groupBy("event_type")
      .agg(array_sort(collect_list(col("m"))).as("ms"))
      .join(broadcast(base), "event_type")
      .select(col("event_type"), col("n"),
        (col("sc").cast("double") / col("n").cast("double")).as("mean_value"),
        element_at(col("ms"), 3).as("ci_lo"),
        element_at(col("ms"), 98).as("ci_hi"))
      .orderBy("event_type")
  }

  /** K for the KMV (k-minimum-values) sketches: standard error ≈
    * 1/√(K−2) ≈ 12.7%. Sized so the gate data exercises BOTH regimes:
    * sf0.001 has ~15 users/type (< K → exact path), sf0.01+ has ≥ 150
    * (≥ K → estimator path). */
  val KmvK = 64

  /** Distinct (event_type, h) rows, h = portable 60-bit hash of the user
    * id — the KMV sketch input. Unlike HLL (engine-private internals,
    * self-gated via an error-bound boolean), KMV over the portable md5
    * hash is REPRODUCIBLE cross-engine, so the sketch estimate itself is
    * hash-gated, not just its accuracy claim. */
  private def kmvHashes(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("portable_hash60(concat('kmv:', cast(user_id as string)))").as("h"))
      .distinct()
  }

  /** KMV distinct-count sketch (Bar-Yossef et al., RANDOM 2002 /
    * Beyer et al., SIGMOD 2007): keep the K smallest hash values; with
    * kth = K-th minimum over the 2^60 hash space, the unbiased distinct
    * estimate is (K−1)·2^60 / kth (exact integer floor via DECIMAL(38,0)
    * — 63·2^60 needs 67 bits). Types with fewer than K distinct hashes
    * report the exact count (the sketch IS the full set there).
    *
    * Gate shape uses a per-type window sort of the distinct hashes;
    * the 100 TB swap is the bounded size-K insertion buffer Aggregator
    * already proven by [[graft.agg.TopK]] (shuffle ≤ K rows per type per
    * partition, no sort) — same output bit-for-bit. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("h")
    kmvHashes(spark, dir)
      .withColumn("rn", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("exact_users"),
        max(when(col("rn") === KmvK, col("h"))).as("kth"))
      .withColumn("kmv_est",
        when(col("exact_users") < KmvK, col("exact_users"))
          .otherwise(expr(
            s"cast(${KmvK - 1} as decimal(38,0)) * 1152921504606846976 div kth")))
      .select(col("event_type"), col("exact_users"), col("kmv_est"))
      .orderBy("event_type")
  }

  /** Sketch-based JACCARD between the user sets of every event-type pair
    * (Beyer et al., SIGMOD 2007 §5: the K minimum hashes of A∪B are a
    * uniform sample of the union, so the fraction of them belonging to
    * A∩B estimates |A∩B|/|A∪B|), next to the exact Jaccard it
    * approximates — both in exact integer micro-units, both hash-gated.
    * The pair table is the (tiny, fixed) set of type pairs, broadcast
    * against the distinct-hash relation; per-pair work is linear in
    * union size, and the sketch fraction uses min(K, |union|) as its
    * denominator so small unions degrade to the exact fraction. */
  def kmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uh = kmvHashes(spark, dir)
    val tp = uh.select(col("event_type")).distinct()
    val pairs = tp.select(col("event_type").as("type_a"))
      .crossJoin(tp.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b"))
    val mem = uh.join(broadcast(pairs),
        col("event_type") === col("type_a") || col("event_type") === col("type_b"))
      .groupBy("type_a", "type_b", "h")
      .agg(
        max(when(col("event_type") === col("type_a"), 1L).otherwise(0L)).as("ina"),
        max(when(col("event_type") === col("type_b"), 1L).otherwise(0L)).as("inb"))
    val w = Window.partitionBy("type_a", "type_b").orderBy("h")
    mem.withColumn("rn", row_number().over(w))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_union"),
        sum(col("ina") * col("inb")).as("inter"),
        sum(when(col("rn") <= KmvK, col("ina") * col("inb")).otherwise(0L)).as("c"))
      .select(col("type_a"), col("type_b"), col("n_union"),
        expr("1000000 * inter div n_union").as("jacc_exact_micro"),
        expr(s"1000000 * c div least(n_union, ${KmvK}L)").as("jacc_kmv_micro"))
      .orderBy("type_a", "type_b")
  }

  /** KMV set-DIFFERENCE estimate |A\B| and |B\A| per event-type pair —
    * the third leg of the sketch set algebra next to
    * [[kmvDistinct]] (cardinality) and [[kmvJaccard]] (intersection
    * ratio): Beyer et al., SIGMOD 2007 §5 again — the K minimum hashes
    * of A∪B are a uniform sample of the union, so the fraction of them
    * in A-only estimates |A\B|/|A∪B|, scaled by the union cardinality
    * estimate from the same sketch's K-th minimum. The answer a mix
    * planner wants from two corpus snapshots' sketches ("how many docs
    * did source A add that B lacks?") without a distinct-join.
    *
    * Exactness discipline: the estimator is integer arithmetic end to
    * end — union_est is the [[kmvDistinct]] floor-division estimate,
    * the difference estimate is one DECIMAL(38,0) multiply before an
    * integral divide (≤2^67 intermediate, far inside decimal range),
    * and the exact differences ride alongside so the gate pins both.
    * Small unions (n_union < K) degrade to the exact count exactly as
    * in kmvDistinct — the sketch IS the set there. */
  def kmvDifference(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uh = kmvHashes(spark, dir)
    val tp = uh.select(col("event_type")).distinct()
    val pairs = tp.select(col("event_type").as("type_a"))
      .crossJoin(tp.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b"))
    val mem = uh.join(broadcast(pairs),
        col("event_type") === col("type_a") || col("event_type") === col("type_b"))
      .groupBy("type_a", "type_b", "h")
      .agg(
        max(when(col("event_type") === col("type_a"), 1L).otherwise(0L)).as("ina"),
        max(when(col("event_type") === col("type_b"), 1L).otherwise(0L)).as("inb"))
    val w = Window.partitionBy("type_a", "type_b").orderBy("h")
    mem.withColumn("rn", row_number().over(w))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_union"),
        sum(col("ina") * (lit(1L) - col("inb"))).as("aminusb_exact"),
        sum(col("inb") * (lit(1L) - col("ina"))).as("bminusa_exact"),
        sum(when(col("rn") <= KmvK, col("ina") * (lit(1L) - col("inb")))
          .otherwise(0L)).as("a_only_s"),
        sum(when(col("rn") <= KmvK, col("inb") * (lit(1L) - col("ina")))
          .otherwise(0L)).as("b_only_s"),
        max(when(col("rn") === KmvK, col("h"))).as("kth"))
      .withColumn("union_est",
        when(col("n_union") < KmvK, col("n_union"))
          .otherwise(expr(
            s"cast(${KmvK - 1} as decimal(38,0)) * 1152921504606846976 div kth")))
      .select(col("type_a"), col("type_b"), col("n_union"),
        col("aminusb_exact"), col("bminusa_exact"),
        expr(s"cast(a_only_s as decimal(38,0)) * union_est div least(n_union, ${KmvK}L)")
          .as("aminusb_kmv"),
        expr(s"cast(b_only_s as decimal(38,0)) * union_est div least(n_union, ${KmvK}L)")
          .as("bminusa_kmv"))
      .orderBy("type_a", "type_b")
  }

  /** Theil-Sen robust trend estimator (Theil 1950, Sen 1968) over the
    * monthly order-volume series: the median of all pairwise slopes
    * (c_j − c_i)/(m_j − m_i) — the estimator that tolerates up to ~29%
    * outliers where OLS ([[olsTrend]]) breaks on one. All arithmetic is
    * exact integer: slopes are fixed-point millionths with an explicit
    * truncate-toward-zero division (Spark `div` truncates, DuckDB `//`
    * floors — they differ on negatives, so the sign is factored out and
    * only nonnegative quantities are divided in BOTH engines), and the
    * median is an order statistic selected by rank counting, not a sort.
    *
    * Scale shape: the corpus reduces to one calendar-bounded monthly
    * aggregate (≤ a few hundred rows at ANY scale factor — pair count is
    * bounded by time span, not data volume), so the pairwise stage and
    * the rank-count self-join are O(months²)/O(slopes²) on a tiny table.
    * No unpartitioned window and no driver collect: the median ranks
    * (n+1)÷2 / (n+2)÷2 ride the plan as a broadcast scalar. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
    // Fresh aliases on the right copy: a bare self-join would resolve
    // both sides' `m` to one attribute and make every denominator 0.
    val later = monthly.select(col("m").as("m2"), col("c").as("c2"))
    // The outer den>0 guard is load-bearing even though the join already
    // ensures m < m2: InferFiltersFromConstraints derives isnotnull(micro)
    // and evaluates the whole expression INSIDE the join condition, ahead
    // of m < m2 — an unguarded division there hits den = 0 pairs and ANSI
    // mode aborts. CASE evaluates lazily, so den = 0 never divides.
    val pairs = monthly.join(later, col("m") < col("m2"))
      .select(((col("c2") - col("c")) * 1000000L).as("num"),
        (col("m2") - col("m")).as("den"))
      .select(when(col("den") > 0,
        when(col("num") >= 0, expr("num div den"))
          .otherwise(-expr("(-num) div den"))).as("micro"))
    val dc = pairs.groupBy("micro").agg(count(lit(1)).as("cnt"))
    val tot = dc.agg(sum(col("cnt")).as("n_pairs"))
    val nm = monthly.agg(count(lit(1)).as("n_months"))
    val below = dc.select(col("micro").as("micro2"), col("cnt").as("cnt2"))
    dc.join(below, col("micro2") <= col("micro"))
      .groupBy(col("micro"))
      .agg(sum(col("cnt2")).as("n_le"))
      .crossJoin(broadcast(tot))
      .groupBy("n_pairs")
      .agg(
        min(when(col("n_le") >= expr("(n_pairs + 1) div 2"), col("micro")))
          .as("med_lo_micro"),
        min(when(col("n_le") >= expr("(n_pairs + 2) div 2"), col("micro")))
          .as("med_hi_micro"))
      .crossJoin(broadcast(nm))
      .select(col("n_months"), col("n_pairs"),
        col("med_lo_micro"), col("med_hi_micro"))
  }

  /** 5%-trimmed mean of order value per priority class — the robust
    * location estimate that survives the heavy right tail OLS-style
    * means don't (trim level k = ⌊n·5/100⌋ rows off EACH end, the
    * classic symmetric trim). Exact integers throughout: prices become
    * cents via one DECIMAL cast, ranks come from a PARTITIONED window
    * (priority classes are the partitions — no global sort), and the
    * mean ships as exact milli-cents floor division. */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byP = Window.partitionBy(col("o_orderpriority"))
    val ranked = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("rk", row_number().over(
        byP.orderBy(col("cents"), col("o_orderkey"))))
      .withColumn("n", count(lit(1)).over(byP))
    ranked
      .filter(col("rk") > expr("n * 5 div 100") &&
        col("rk") <= col("n") - expr("n * 5 div 100"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("sum_cents"))
      .withColumn("mean_cents_milli", expr("1000 * sum_cents div n_kept"))
      .orderBy("o_orderpriority")
  }

  /** Hodges-Lehmann pseudo-median (Hodges & Lehmann 1963) of the daily
    * event volume: the median of all Walsh averages (c_i + c_j)/2, i ≤ j
    * — the location estimator of the Wilcoxon test, robust like the
    * median but ~50% more efficient at the Gaussian. Reported as the
    * exact integer PAIR SUM (2× the pseudo-median) so no halving ever
    * leaves the integers; the median is selected by the same rank-count
    * scheme as [[theilSen]] — the day series is calendar-bounded, so the
    * Walsh set is O(days²) on an aggregated table at ANY corpus scale,
    * and there is no global window and no collect. */
  def hodgesLehmann(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val other = daily.select(col("day").as("day2"), col("c").as("c2"))
    val walsh = daily.join(other, col("day") <= col("day2"))
      .select((col("c") + col("c2")).as("w"))
    val dc = walsh.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = dc.agg(sum(col("cnt")).as("n_walsh"))
    val nd = daily.agg(count(lit(1)).as("n_days"))
    val below = dc.select(col("w").as("w2"), col("cnt").as("cnt2"))
    dc.join(below, col("w2") <= col("w"))
      .groupBy(col("w"))
      .agg(sum(col("cnt2")).as("n_le"))
      .crossJoin(broadcast(tot))
      .groupBy("n_walsh")
      .agg(
        min(when(col("n_le") >= expr("(n_walsh + 1) div 2"), col("w")))
          .as("hl2_lo"),
        min(when(col("n_le") >= expr("(n_walsh + 2) div 2"), col("w")))
          .as("hl2_hi"))
      .crossJoin(broadcast(nd))
      .select(col("n_days"), col("n_walsh"), col("hl2_lo"), col("hl2_hi"))
  }

  /** Spearman rank correlation between quantity and price per return
    * flag — the robust monotone-association twin of
    * [[corrPriceQty]]'s Pearson. Ranks are AVERAGE ranks (the standard
    * tie treatment), carried as DOUBLED integers (2·avg_rank is always
    * integral) so every moment is exact; the moment sums run in
    * DECIMAL(38,0) (bounded: n·Σr² ≤ ~5e23 at sf1 — 24 digits).
    *
    * Scale shape — MEASURED A/B, r15 (the r14 verdict's suggested
    * window-only form was built, gated green, and benched at both
    * scales before being rejected): ranking directly over rows with
    * RANGE-frame windows partitioned by the flag removes both
    * join-backs and wins ~10% at sf0.1 (2.34 vs 2.58 s), but the flag
    * has THREE values, so the two row-scale window sorts collapse into
    * three single-task sorts — derived sf1 read 13.4/15.9 s vs ~7 s for
    * this formulation. Here the heavy sorts are the JOIN-BACK sorts,
    * hash-partitioned 32-way on (flag, value), and the window pass runs
    * over the distinct-value HISTOGRAM per flag (the
    * [[histPercentiles]] trick — value-domain-sized for quantity; price
    * is near-unique so its histogram is row-sized, but its rank sort
    * still parallelizes through the join shuffle). That parallelism is
    * exactly what a 1000-executor cluster needs from a 3-group rank —
    * the low-cardinality partition key must never carry the sort. Then
    * one hash aggregation of five exact moments. The only doubles are
    * the three final casts feeding one fixed IEEE sqrt/divide
    * expression, identical term-for-term in the oracle, so rho_micro is
    * bit-portable (int→double, ×, /, sqrt are all correctly rounded
    * IEEE ops). */
  def spearmanRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rank2(values: DataFrame, vcol: String, out: String): DataFrame = {
      val w = Window.partitionBy("l_returnflag").orderBy("v")
      values.groupBy(col("l_returnflag"), col(vcol).as("v"))
        .agg(count(lit(1)).as("cc"))
        .withColumn("hi", sum(col("cc")).over(w))
        // doubled average rank of a tie-block ending at cumulative
        // position hi with cc members: lo = hi-cc+1, 2·avg = lo+hi
        .select(col("l_returnflag"), col("v").as(vcol),
          (col("hi") * 2 - col("cc") + 1).as(out))
    }
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val rx = rank2(li.select(col("l_returnflag"), col("l_quantity").as("v")),
      "v", "rx").withColumnRenamed("v", "l_quantity")
    val ry = rank2(li.select(col("l_returnflag"), col("l_extendedprice").as("v")),
      "v", "ry").withColumnRenamed("v", "l_extendedprice")
    val d38 = DecimalType(38, 0)
    val joined = li
      .join(rx, Seq("l_returnflag", "l_quantity"))
      .join(ry, Seq("l_returnflag", "l_extendedprice"))
      .select(col("l_returnflag"),
        col("rx").cast(d38).as("rx"), col("ry").cast(d38).as("ry"))
    joined.groupBy("l_returnflag")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        expr("""cast(floor(1000000.0d
               |  * cast(n * sxy - sx * sy as double)
               |  / (sqrt(cast(n * sxx - sx * sx as double))
               |     * sqrt(cast(n * syy - sy * sy as double))) + 0.5d)
               |as bigint)""".stripMargin).as("rho_micro"))
      .orderBy("l_returnflag")
  }

  /** Kendall tau-b between time and monthly order volume — the
    * rank-concordance trend test that complements [[mannKendall]] (which
    * reports the S statistic; this reports the tie-corrected tau-b with
    * full pair accounting). Months are distinct so ties_x = 0; y-ties
    * enter the tau-b denominator. All pair counts are exact BIGINTs from
    * a fresh-alias self-join of the MONTHLY aggregate (O(months²) on an
    * aggregated table at any corpus scale); the only doubles feed one
    * fixed IEEE sqrt expression, mirrored exactly in the oracle. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
    val later = monthly.select(col("m").as("m2"), col("c").as("c2"))
    val pairs = monthly.join(later, col("m") < col("m2"))
    val agg = pairs.agg(
      sum(when(col("c2") > col("c"), 1L).otherwise(0L)).as("concordant"),
      sum(when(col("c2") < col("c"), 1L).otherwise(0L)).as("discordant"),
      sum(when(col("c2") === col("c"), 1L).otherwise(0L)).as("ties_y"),
      count(lit(1)).as("n_pairs"))
    agg.crossJoin(broadcast(monthly.agg(count(lit(1)).as("n_months"))))
      .select(col("n_months"), col("n_pairs"), col("concordant"),
        col("discordant"), col("ties_y"),
        expr("""cast(floor(1000000.0d
               |  * cast(concordant - discordant as double)
               |  / (sqrt(cast(n_pairs as double))
               |     * sqrt(cast(n_pairs - ties_y as double))) + 0.5d)
               |as bigint)""".stripMargin).as("tau_b_micro"))
  }

  /** Cramér's V effect size for the event-type × ISO-weekday
    * contingency — the normalized companion of [[chi2Independence]]
    * answering "HOW strong is the association", not just "is there
    * one". The statistic is defined over the exact per-cell integer
    * micro contributions (each cell's ⌊dev²·10⁶/(n·r·c)⌋, the same
    * quantity the chi2 query gates cell-by-cell), so the total is an
    * exact BIGINT sum in both engines and the single IEEE sqrt at the
    * end is bit-portable. One scan, 35-cell contingency, broadcast
    * margins. Exactness bound: dev = o·n − r·c is O(n²), so the
    * dev²·10⁶ numerator is O(n⁴·10⁶) — inside DECIMAL(38,0) / DuckDB
    * HUGEINT up to roughly n ≈ 10⁸ events with skewed margins. Beyond
    * that, rescale the margins (compute dev per 10⁶ events) before
    * squaring; the shipped form is exact at any gate scale and at the
    * 10⁸-event corpus scale, not unboundedly. */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), ((dayofweek(col("ts")) + 5) % 7 + 1).as("iso_dow"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
    val cols = cells.groupBy("iso_dow").agg(sum(col("o")).as("c"))
    val tot  = cells.agg(sum(col("o")).as("n"))
    val dims = cells.agg(
      countDistinct(col("event_type")).as("n_rows"),
      countDistinct(col("iso_dow")).as("n_cols"))
    cells
      .join(broadcast(rows), "event_type")
      .join(broadcast(cols), "iso_dow")
      .crossJoin(broadcast(tot))
      .withColumn("dev", col("o") * col("n") - col("r") * col("c"))
      .select(col("n"),
        expr("""cast((cast(dev as decimal(38,0)) * cast(dev as decimal(38,0))
               |      * 1000000) div (cast(n as decimal(38,0)) * r * c)
               |  as bigint)""".stripMargin).as("cell_micro"))
      .groupBy("n").agg(sum(col("cell_micro")).as("chi2_micro_total"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("n_rows"), col("n_cols"), col("chi2_micro_total"),
        expr("""cast(floor(1000000.0d * sqrt(
               |    cast(chi2_micro_total as double)
               |  / (1000000.0d * cast(n as double)
               |     * cast(least(n_rows - 1, n_cols - 1) as double))) + 0.5d)
               |as bigint)""".stripMargin).as("cramers_v_micro"))
  }

  /** 5%-winsorized mean of order value per priority class — the
    * companion of [[trimmedMean]] that CLAMPS the k = ⌊n·5/100⌋ most
    * extreme values on each side to the boundary order statistics
    * instead of dropping them (winsorizing preserves n, so downstream
    * weighting stays intact — the reason pipelines often prefer it to
    * trimming). Two passes over the PARTITIONED rank window output:
    * boundary values (the (k+1)-th and (n−k)-th order statistics) from
    * one conditional aggregation, then the clamped exact-cents sum via
    * a broadcast join of the ≤5-row boundary table. */
  def winsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byP = Window.partitionBy(col("o_orderpriority"))
    val ranked = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("rk", row_number().over(
        byP.orderBy(col("cents"), col("o_orderkey"))))
      .withColumn("n", count(lit(1)).over(byP))
      .withColumn("k", expr("n * 5 div 100"))
    val bounds = ranked.groupBy("o_orderpriority")
      .agg(max(col("n")).as("n"),
        min(when(col("rk") >= col("k") + 1, col("cents"))).as("lo_cents"),
        max(when(col("rk") <= col("n") - col("k"), col("cents"))).as("hi_cents"))
    ranked.join(broadcast(bounds.select("o_orderpriority", "lo_cents", "hi_cents")),
        "o_orderpriority")
      .select(col("o_orderpriority"),
        greatest(col("lo_cents"), least(col("hi_cents"), col("cents"))).as("w"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sum_cents"))
      .join(broadcast(bounds.select("o_orderpriority", "lo_cents", "hi_cents")),
        "o_orderpriority")
      .select(col("o_orderpriority"), col("n"), col("lo_cents"), col("hi_cents"),
        col("sum_cents"),
        expr("1000 * sum_cents div n").as("mean_cents_milli"))
      .orderBy("o_orderpriority")
  }

  /** AMS "tug-of-war" second-moment sketch (Alon, Matias & Szegedy,
    * "The space complexity of approximating the frequency moments",
    * STOC 1996): F₂ = Σ f_u² of the user-activity frequency vector,
    * estimated from 16 counters — each Z_j = Σ_u s_j(u)·f_u with a
    * 4-wise-ish sign hash s_j(u) ∈ {−1, +1}, E[Z_j²] = F₂. F₂ is the
    * self-join size / skew functional every shuffle planner wants before
    * committing to a join strategy, and the sketch needs 16 longs where
    * the exact answer needs a full per-key aggregation — the point at
    * 100 TB. Signs come from the engine's portable hash (parity bit of
    * `portable_hash60('ams' || j || ':' || user)`), so every Z_j is an
    * exact BIGINT in both engines; the estimate is the mean of the 16
    * squares (floor div — exact), and the exact F₂ rides along so the
    * estimator's error is itself gated. One partial-aggregated frequency
    * scan + a 16×-explode of the ≤|users| frequency table; the sketch
    * state that crosses the wire is 16 rows.
    *
    * EXACTNESS DOMAIN: |Z_j| ≤ F₁ (total event count), so `z_sq` and the
    * 16-term `f2_est_mean` sum stay inside BIGINT while F₁ ≤ ~3.0e9
    * (√(2⁶³/16)); likewise `f2_exact` needs Σf² < 2⁶³. Beyond that the
    * squares need 128-bit arithmetic — but BOTH engines' wide types decay
    * to float64 at this gate's pandas boundary (DuckDB HUGEINT and
    * DECIMAL(38,0) alike), so a wider output column cannot be
    * exact-compared here, and at such magnitudes the sketch's own ~1/√16
    * relative error dwarfs 64-bit rounding anyway: a 100 TB deployment
    * would carry z_sq as DECIMAL(38,0) (or double) and gate only z. The
    * BIGINT formulation is the exact-while-exact-is-possible choice, not
    * an unstated assumption. */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    val freq = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("f"))
    val z = freq
      .select(col("f"), explode(expr(
        // r16: unrolled, same reason as the CMS cells above
        (0 until 16).map(j => s"named_struct('j', $j, " +
          s"'s', portable_hash60(concat('ams', $j, ':', cast(user_id as string))) % 2 * 2 - 1)")
          .mkString("array(", ", ", ")"))).as("x"))
      .groupBy(col("x.j").cast("long").as("estimator"))
      .agg(sum(col("x.s") * col("f")).as("z"))
    val exact = freq.agg(sum(col("f") * col("f")).as("f2_exact"))
    val meanEst = z.agg(expr("sum(z * z) div 16").as("f2_est_mean"))
    z.crossJoin(broadcast(exact)).crossJoin(broadcast(meanEst))
      .select(col("estimator"), col("z"), (col("z") * col("z")).as("z_sq"),
        col("f2_exact"), col("f2_est_mean"),
        ((col("f2_est_mean") - col("f2_exact")).cast("double") / col("f2_exact"))
          .as("mean_rel_err"))
      .orderBy("estimator")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_ams_f2" -> (amsF2 _),
    "agg_winsorized_mean" -> (winsorizedMean _),
    "sketch_hll_merge" -> (hllMerge _),
    "sketch_hll_intersection" -> (hllIntersection _),
    "agg_spearman" -> (spearmanRank _),
    "agg_kendall_tau" -> (kendallTau _),
    "agg_cramers_v" -> (cramersV _),
    "agg_hodges_lehmann" -> (hodgesLehmann _),
    "agg_trimmed_mean" -> (trimmedMean _),
    "agg_theil_sen" -> (theilSen _),
    "sketch_kmv_distinct" -> (kmvDistinct _),
    "sketch_kmv_jaccard" -> (kmvJaccard _),
    "sketch_kmv_difference" -> (kmvDifference _),
    "agg_bootstrap_ci" -> (bootstrapCi _),
    "agg_chi2_independence" -> (chi2Independence _),
    "agg_argmax" -> (argExtremes _),
    "agg_market_basket" -> (marketBasket _),
    "agg_autocorr" -> (autocorrRevenue _),
    "agg_tukey_outliers" -> (tukeyOutliers _),
    "agg_equidepth_deciles" -> (equidepthDeciles _),
    "sketch_cms_topk" -> (cmsTopkProbe _),
    "agg_benford" -> (benfordPrices _),
    "sketch_hll_registers" -> (hllRegisters _),
    "sketch_hll_estimate" -> (hllEstimate _),
    "agg_mann_kendall" -> (mannKendall _),
    "agg_ols_trend" -> (olsTrend _),
    "agg_string_agg_nations" -> (stringAggNations _),
    "agg_mode_priority" -> (modePriority _),
    "agg_dispersion_qty" -> (dispersionQty _),
    "agg_skew_kurt" -> (skewKurtQty _),
    "agg_bool_stats" -> (boolStats _),
    "agg_histogram_prices" -> (histogramPrices _),
    "agg_percentiles" -> (percentiles _),
    "agg_pivot_priority_by_status" -> (pivotPriorityByStatus _),
    "agg_salted_top_users" -> (saltedTopUsers _),
    "join_salted_skew" -> (saltedSkewJoin _),
    "agg_exact_median_2pass" -> (exactMedianTwoPass _),
    "agg_weighted_median" -> (weightedMedian _),
    "sketch_cms_users" -> (cmsUsers _),
    "sketch_bloom_probe" -> (bloomProbe _),
    "agg_corr_price_qty" -> (corrPriceQty _),
    "sketch_hll_users" -> (sketchDistinct _),
    "sketch_approx_quantiles" -> (sketchQuantiles _)
  )

  /** DuckDB equivalent of `portable_hash60(x)`: first 15 hex chars of
    * md5(x) folded to a BIGINT. */
  private def h60Sql(x: String): String =
    s"list_reduce(list_transform(range(1,16), k -> CAST(strpos('0123456789abcdef', substr(md5($x), k, 1)) - 1 AS BIGINT)), (a,b) -> a*16+b)"

  /** Shared register-table CTE body for the two HLL oracles. */
  private val hllRegSql: String =
    s"""h AS (SELECT ${h60Sql("'hll:' || CAST(user_id AS VARCHAR)")} AS h FROM events),
       |r AS (SELECT h // 18014398509481984 AS register, h % 18014398509481984 AS rem FROM h),
       |rk AS (SELECT register, CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END AS rnk FROM r),
       |mx AS (SELECT register, MAX(rnk) AS max_rank FROM rk GROUP BY register),
       |regs AS (SELECT g.i AS register, CAST(COALESCE(max_rank, 0) AS INTEGER) AS max_rank
       |  FROM (SELECT unnest(range(64)) AS i) g LEFT JOIN mx ON g.i = mx.register)""".stripMargin

  /** Shared oracle CTE for the KMV sketches: distinct portable user
    * hashes per event type. */
  private val kmvCte: String =
    s"""uh AS (SELECT DISTINCT event_type,
       |  ${h60Sql("'kmv:' || CAST(user_id AS VARCHAR)")} AS h FROM events)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sketch_hll_intersection" ->
      s"""WITH e AS (SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
         |    user_id FROM events
         |  WHERE CAST(json_extract_string(props, '$$.k') AS INTEGER) IN (1, 2)),
         |h AS (SELECT k, ${h60Sql("'hll:' || CAST(user_id AS VARCHAR)")} AS h FROM e),
         |r AS (SELECT k, h // 18014398509481984 AS register,
         |    h % 18014398509481984 AS rem FROM h),
         |rk AS (SELECT k, register,
         |    CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END AS rnk FROM r),
         |perk AS (SELECT k, register, MAX(rnk) AS mr FROM rk GROUP BY 1, 2),
         |un AS (SELECT register, MAX(mr) AS mr FROM perk GROUP BY 1),
         |ha AS (SELECT CAST(SUM(1::BIGINT << (55 - mr))
         |    + (64 - COUNT(*)) * 36028797018963968 AS BIGINT) AS ha
         |  FROM perk WHERE k = 1),
         |hb AS (SELECT CAST(SUM(1::BIGINT << (55 - mr))
         |    + (64 - COUNT(*)) * 36028797018963968 AS BIGINT) AS hb
         |  FROM perk WHERE k = 2),
         |hu AS (SELECT CAST(SUM(1::BIGINT << (55 - mr))
         |    + (64 - COUNT(*)) * 36028797018963968 AS BIGINT) AS hu
         |  FROM un),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         |    CAST(SUM(CASE WHEN nk = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS exact_intersection
         |  FROM (SELECT user_id, COUNT(DISTINCT k) AS nk FROM e GROUP BY 1))
         |SELECT ha, hb, hu,
         |  7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(ha AS DOUBLE) AS est_a,
         |  7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(hb AS DOUBLE) AS est_b,
         |  7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(hu AS DOUBLE) AS est_union,
         |  (7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(ha AS DOUBLE)
         |   + 7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(hb AS DOUBLE))
         |  - 7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(hu AS DOUBLE)
         |    AS est_intersection,
         |  exact_union, exact_intersection
         |FROM ha, hb, hu, ex""".stripMargin,
    "agg_winsorized_mean" ->
      """WITH base AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT o_orderpriority, cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY cents, o_orderkey) AS rk,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM base),
        |b AS (SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MIN(CASE WHEN rk >= (n * 5) // 100 + 1 THEN cents END) AS BIGINT)
        |      AS lo_cents,
        |    CAST(MAX(CASE WHEN rk <= n - (n * 5) // 100 THEN cents END) AS BIGINT)
        |      AS hi_cents
        |  FROM r GROUP BY 1),
        |w AS (SELECT r.o_orderpriority,
        |    GREATEST(b.lo_cents, LEAST(b.hi_cents, r.cents)) AS wc
        |  FROM r JOIN b USING (o_orderpriority))
        |SELECT w.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  b.lo_cents, b.hi_cents,
        |  CAST(SUM(wc) AS BIGINT) AS sum_cents,
        |  CAST(1000 * SUM(wc) // COUNT(*) AS BIGINT) AS mean_cents_milli
        |FROM w JOIN b USING (o_orderpriority)
        |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin,
    "sketch_ams_f2" ->
      s"""WITH freq AS (SELECT user_id, COUNT(*) AS f FROM events GROUP BY 1),
         |sgn AS (SELECT f, j,
         |    (${h60Sql("'ams' || j || ':' || CAST(user_id AS VARCHAR)")} % 2) * 2 - 1 AS s
         |  FROM freq, (SELECT unnest(range(16)) AS j) js),
         |z AS (SELECT j AS estimator, CAST(SUM(s * f) AS BIGINT) AS z
         |      FROM sgn GROUP BY 1),
         |ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact FROM freq),
         |me AS (SELECT CAST(SUM(z * z) // 16 AS BIGINT) AS f2_est_mean FROM z)
         |SELECT estimator, z, CAST(z * z AS BIGINT) AS z_sq, f2_exact,
         |  f2_est_mean,
         |  CAST(f2_est_mean - f2_exact AS DOUBLE) / f2_exact AS mean_rel_err
         |FROM z, ex, me ORDER BY estimator""".stripMargin,
    "sketch_hll_merge" ->
      s"""WITH h AS (SELECT event_type,
         |    ${h60Sql("'hll:' || CAST(user_id AS VARCHAR)")} AS h FROM events),
         |r AS (SELECT event_type, h // 18014398509481984 AS register,
         |             h % 18014398509481984 AS rem FROM h),
         |rk AS (SELECT event_type, register,
         |         CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END AS rnk
         |       FROM r),
         |shard AS (SELECT event_type, register, MAX(rnk) AS mr
         |          FROM rk GROUP BY 1, 2),
         |merged AS (SELECT register, CAST(COUNT(*) AS BIGINT) AS n_shards,
         |             MAX(mr) AS merged FROM shard GROUP BY 1),
         |direct AS (SELECT register, MAX(rnk) AS direct FROM rk GROUP BY 1)
         |SELECT g.i AS register,
         |  COALESCE(m.n_shards, 0) AS n_shards,
         |  CAST(COALESCE(m.merged, 0) AS INTEGER) AS merged_max_rank,
         |  CAST(COALESCE(d.direct, 0) AS INTEGER) AS direct_max_rank,
         |  CAST(CASE WHEN COALESCE(m.merged, 0) = COALESCE(d.direct, 0)
         |       THEN 1 ELSE 0 END AS INTEGER) AS is_equal
         |FROM (SELECT unnest(range(64)) AS i) g
         |LEFT JOIN merged m ON g.i = m.register
         |LEFT JOIN direct d ON g.i = d.register
         |ORDER BY register""".stripMargin,
    "agg_spearman" ->
      """WITH rx AS (
        |  SELECT l_returnflag, v AS l_quantity,
        |    CAST(2 * SUM(cc) OVER (PARTITION BY l_returnflag ORDER BY v)
        |         - cc + 1 AS BIGINT) AS rx
        |  FROM (SELECT l_returnflag, l_quantity AS v, COUNT(*) AS cc
        |        FROM lineitem GROUP BY 1, 2)),
        |ry AS (
        |  SELECT l_returnflag, v AS l_extendedprice,
        |    CAST(2 * SUM(cc) OVER (PARTITION BY l_returnflag ORDER BY v)
        |         - cc + 1 AS BIGINT) AS ry
        |  FROM (SELECT l_returnflag, l_extendedprice AS v, COUNT(*) AS cc
        |        FROM lineitem GROUP BY 1, 2)),
        |j AS (
        |  SELECT li.l_returnflag,
        |    CAST(rx AS HUGEINT) AS rx, CAST(ry AS HUGEINT) AS ry
        |  FROM lineitem li
        |  JOIN rx ON li.l_returnflag = rx.l_returnflag
        |         AND li.l_quantity = rx.l_quantity
        |  JOIN ry ON li.l_returnflag = ry.l_returnflag
        |         AND li.l_extendedprice = ry.l_extendedprice),
        |mo AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
        |    SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
        |  FROM j GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  CAST(FLOOR(1000000.0
        |    * CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) + 0.5)
        |  AS BIGINT) AS rho_micro
        |FROM mo ORDER BY l_returnflag""".stripMargin,
    "agg_kendall_tau" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN b.c > a.c THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(SUM(CASE WHEN b.c < a.c THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |    CAST(SUM(CASE WHEN b.c = a.c THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM monthly a JOIN monthly b ON a.m < b.m)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n_months,
        |  n_pairs, concordant, discordant, ties_y,
        |  CAST(FLOOR(1000000.0 * CAST(concordant - discordant AS DOUBLE)
        |    / (sqrt(CAST(n_pairs AS DOUBLE))
        |       * sqrt(CAST(n_pairs - ties_y AS DOUBLE))) + 0.5)
        |  AS BIGINT) AS tau_b_micro
        |FROM p""".stripMargin,
    "agg_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type, isodow(ts) AS iso_dow, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rr AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cc AS (SELECT iso_dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |dims AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
        |                CAST(COUNT(DISTINCT iso_dow) AS BIGINT) AS n_cols
        |         FROM cells),
        |tot AS (
        |  SELECT n, CAST(SUM(
        |      (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |      * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |      * 1000000 // (CAST(n AS HUGEINT) * r * c)
        |    ) AS BIGINT) AS chi2_micro_total
        |  FROM cells
        |  JOIN rr USING (event_type) JOIN cc USING (iso_dow), tt
        |  GROUP BY n)
        |SELECT n, n_rows, n_cols, chi2_micro_total,
        |  CAST(FLOOR(1000000.0 * sqrt(
        |      CAST(chi2_micro_total AS DOUBLE)
        |    / (1000000.0 * CAST(n AS DOUBLE)
        |       * CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE))) + 0.5)
        |  AS BIGINT) AS cramers_v_micro
        |FROM tot, dims""".stripMargin,
    "agg_hodges_lehmann" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |walsh AS (
        |  SELECT a.c + b.c AS w FROM daily a JOIN daily b ON a.day <= b.day),
        |dc AS (SELECT w, COUNT(*) AS cnt FROM walsh GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_walsh FROM dc),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        |cum AS (SELECT x.w, CAST(SUM(y.cnt) AS BIGINT) AS n_le
        |        FROM dc x JOIN dc y ON y.w <= x.w GROUP BY 1)
        |SELECT n_days, n_walsh,
        |  (SELECT MIN(w) FROM cum, tot
        |     WHERE n_le >= (n_walsh + 1) // 2) AS hl2_lo,
        |  (SELECT MIN(w) FROM cum, tot
        |     WHERE n_le >= (n_walsh + 2) // 2) AS hl2_hi
        |FROM nd, tot""".stripMargin,
    "agg_trimmed_mean" ->
      """WITH base AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT o_orderpriority, cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY cents, o_orderkey) AS rk,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM base)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  CAST((1000 * SUM(cents)) // COUNT(*) AS BIGINT) AS mean_cents_milli
        |FROM r
        |WHERE rk > (n * 5) // 100 AND rk <= n - (n * 5) // 100
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_theil_sen" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT (b.c - a.c) * 1000000 AS num, b.m - a.m AS den
        |  FROM monthly a JOIN monthly b ON a.m < b.m),
        |sl AS (
        |  SELECT CASE WHEN num >= 0 THEN num // den
        |              ELSE -((-num) // den) END AS micro
        |  FROM pairs),
        |dc AS (SELECT micro, COUNT(*) AS cnt FROM sl GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_pairs FROM dc),
        |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly),
        |cum AS (SELECT x.micro, CAST(SUM(y.cnt) AS BIGINT) AS n_le
        |        FROM dc x JOIN dc y ON y.micro <= x.micro GROUP BY 1)
        |SELECT n_months, n_pairs,
        |  (SELECT MIN(micro) FROM cum, tot
        |     WHERE n_le >= (n_pairs + 1) // 2) AS med_lo_micro,
        |  (SELECT MIN(micro) FROM cum, tot
        |     WHERE n_le >= (n_pairs + 2) // 2) AS med_hi_micro
        |FROM nm, tot""".stripMargin,
    "sketch_kmv_distinct" ->
      s"""WITH $kmvCte,
         |rn AS (SELECT event_type, h,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM uh),
         |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_users,
         |    MAX(CASE WHEN rn = $KmvK THEN h END) AS kth
         |  FROM rn GROUP BY 1)
         |SELECT event_type, exact_users,
         |  CAST(CASE WHEN exact_users < $KmvK THEN exact_users
         |       ELSE CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976 // kth
         |       END AS BIGINT) AS kmv_est
         |FROM agg ORDER BY event_type""".stripMargin,
    "sketch_kmv_jaccard" ->
      s"""WITH $kmvCte,
         |tp AS (SELECT DISTINCT event_type FROM uh),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |          FROM tp a JOIN tp b ON a.event_type < b.event_type),
         |mem AS (SELECT p.type_a, p.type_b, u.h,
         |    MAX(CASE WHEN u.event_type = p.type_a THEN 1 ELSE 0 END) AS ina,
         |    MAX(CASE WHEN u.event_type = p.type_b THEN 1 ELSE 0 END) AS inb
         |  FROM pairs p JOIN uh u ON u.event_type IN (p.type_a, p.type_b)
         |  GROUP BY 1, 2, 3),
         |rn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b
         |                                    ORDER BY h) AS rn FROM mem)
         |SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_union,
         |  CAST(1000000 * SUM(ina * inb) // COUNT(*) AS BIGINT)
         |    AS jacc_exact_micro,
         |  CAST(1000000 * SUM(CASE WHEN rn <= $KmvK THEN ina * inb ELSE 0 END)
         |       // LEAST(COUNT(*), $KmvK) AS BIGINT) AS jacc_kmv_micro
         |FROM rn GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sketch_kmv_difference" ->
      s"""WITH $kmvCte,
         |tp AS (SELECT DISTINCT event_type FROM uh),
         |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |          FROM tp a JOIN tp b ON a.event_type < b.event_type),
         |mem AS (SELECT p.type_a, p.type_b, u.h,
         |    MAX(CASE WHEN u.event_type = p.type_a THEN 1 ELSE 0 END) AS ina,
         |    MAX(CASE WHEN u.event_type = p.type_b THEN 1 ELSE 0 END) AS inb
         |  FROM pairs p JOIN uh u ON u.event_type IN (p.type_a, p.type_b)
         |  GROUP BY 1, 2, 3),
         |rn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b
         |                                    ORDER BY h) AS rn FROM mem),
         |agg AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_union,
         |    CAST(SUM(ina * (1 - inb)) AS BIGINT) AS aminusb_exact,
         |    CAST(SUM(inb * (1 - ina)) AS BIGINT) AS bminusa_exact,
         |    SUM(CASE WHEN rn <= $KmvK THEN ina * (1 - inb) ELSE 0 END) AS a_only_s,
         |    SUM(CASE WHEN rn <= $KmvK THEN inb * (1 - ina) ELSE 0 END) AS b_only_s,
         |    MAX(CASE WHEN rn = $KmvK THEN h END) AS kth
         |  FROM rn GROUP BY 1, 2),
         |est AS (SELECT *,
         |    CASE WHEN n_union < $KmvK THEN n_union
         |         ELSE CAST(${KmvK - 1} AS HUGEINT) * 1152921504606846976 // kth
         |         END AS union_est
         |  FROM agg)
         |SELECT type_a, type_b, n_union, aminusb_exact, bminusa_exact,
         |  CAST(CAST(a_only_s AS HUGEINT) * union_est
         |       // LEAST(n_union, $KmvK) AS BIGINT) AS aminusb_kmv,
         |  CAST(CAST(b_only_s AS HUGEINT) * union_est
         |       // LEAST(n_union, $KmvK) AS BIGINT) AS bminusa_kmv
         |FROM est ORDER BY 1, 2""".stripMargin,
    "agg_bootstrap_ci" ->
      s"""WITH ev AS (SELECT event_type, event_id,
         |    CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
         |  FROM events),
         |base AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sc
         |         FROM ev GROUP BY 1),
         |hashed AS (SELECT event_type, cents,
         |    ${h60Sql("'boot:' || CAST(event_id AS VARCHAR)")} AS h
         |  FROM ev),
         |weighted AS (SELECT event_type, cents, r.b AS b,
         |    len(list_filter([${PoissonThresholds.mkString(", ")}],
         |        t -> t <= ${mix60Duck("h", "r.b")}))
         |      AS w
         |  FROM hashed, range(0, 100) r(b)),
         |rep AS (SELECT event_type, b,
         |    CAST(SUM(w * cents) AS BIGINT) AS swc, CAST(SUM(w) AS BIGINT) AS sw
         |  FROM weighted GROUP BY 1, 2),
         |means AS (SELECT event_type, b,
         |    CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) AS m FROM rep)
         |SELECT means.event_type, n,
         |  CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
         |  (list(m ORDER BY m))[3] AS ci_lo,
         |  (list(m ORDER BY m))[98] AS ci_hi
         |FROM means JOIN base USING (event_type)
         |GROUP BY means.event_type, n, sc ORDER BY event_type""".stripMargin,
    "agg_chi2_independence" ->
      """WITH cells AS (SELECT event_type, CAST(isodow(ts) AS INTEGER) AS iso_dow,
        |    COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT iso_dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
        |SELECT cells.event_type, cells.iso_dow, CAST(o AS BIGINT) AS o, r, c, n,
        |  CAST(o * n - r * c AS BIGINT) AS dev,
        |  CAST((CAST(o * n - r * c AS HUGEINT) * (o * n - r * c) * 1000000)
        |    // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS chi2_micro
        |FROM cells JOIN rt USING (event_type) JOIN ct USING (iso_dow) CROSS JOIN tt
        |ORDER BY event_type, iso_dow""".stripMargin,
    "agg_argmax" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rmax,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  MAX(CASE WHEN rmax = 1 THEN o_totalprice END) AS max_price,
        |  CAST(MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS BIGINT) AS max_price_orderkey,
        |  MAX(CASE WHEN rmin = 1 THEN o_totalprice END) AS min_price,
        |  CAST(MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS BIGINT) AS min_price_orderkey
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_market_basket" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT COUNT(DISTINCT okey) AS n_baskets FROM items),
        |cnt AS (SELECT brand, COUNT(*) AS cnt FROM items GROUP BY 1),
        |pairs AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
        |    COUNT(*) AS support
        |  FROM items a JOIN items b ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 20)
        |SELECT brand_a, brand_b, support, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
        |  CAST(support AS DOUBLE) / CAST(ca.cnt AS DOUBLE) AS conf_a_to_b,
        |  CAST(support AS DOUBLE) / CAST(cb.cnt AS DOUBLE) AS conf_b_to_a,
        |  CAST(support * n_baskets AS DOUBLE)
        |    / CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift
        |FROM pairs JOIN cnt ca ON brand_a = ca.brand
        |           JOIN cnt cb ON brand_b = cb.brand
        |           CROSS JOIN n
        |ORDER BY brand_a, brand_b""".stripMargin,
    "agg_autocorr" ->
      """WITH s AS (SELECT l_returnflag, date_trunc('month', l_shipdate) AS mon,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |px AS (SELECT l_returnflag, mon, cents // 100000 AS x FROM s),
        |p AS (SELECT l_returnflag, x,
        |    lag(x) OVER (PARTITION BY l_returnflag ORDER BY mon) AS y FROM px),
        |q AS (SELECT * FROM p WHERE y IS NOT NULL),
        |a AS (SELECT l_returnflag, COUNT(*) AS n_pairs,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(x*y) AS BIGINT) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(x*x) AS BIGINT) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(y*y) AS BIGINT) AS DOUBLE) AS syy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n_pairs,
        |  CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0.0
        |       THEN (n * sxy - sx * sy)
        |            / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        |  END AS autocorr_r1
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "agg_tukey_outliers" ->
      """WITH f AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.25) AS p25,
        |    quantile_cont(l_extendedprice, 0.75) AS p75
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT l_returnflag, p25, p75,
        |    p25 - 1.5e0 * (p75 - p25) AS lo,
        |    p75 + 1.5e0 * (p75 - p25) AS hi
        |  FROM f)
        |SELECT l.l_returnflag, COUNT(*) AS n_rows,
        |  MAX(g.p25) AS p25, MAX(g.p75) AS p75,
        |  CAST(SUM(CASE WHEN l.l_extendedprice < g.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN l.l_extendedprice > g.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM lineitem l JOIN g ON l.l_returnflag = g.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_equidepth_deciles" ->
      """WITH bv AS (SELECT l_returnflag, l_extendedprice AS v, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cw AS (SELECT l_returnflag, v,
        |    CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM bv),
        |x AS (SELECT l_returnflag, v, cum, n, g.d
        |  FROM cw CROSS JOIN (SELECT unnest(range(1, 10)) AS d) g
        |  WHERE cum * 10 >= d * n)
        |SELECT l_returnflag, CAST(d AS INTEGER) AS d, MIN(v) AS boundary,
        |  MAX(n) AS n_rows
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sketch_cms_topk" ->
      s"""WITH rows_ AS (
         |  SELECT g.r AS r,
         |    ${h60Sql("'cms' || CAST(g.r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 256 AS c
         |  FROM events CROSS JOIN (SELECT unnest(range(4)) AS r) g),
         |cells AS (SELECT r, c, COUNT(*) AS cell_count FROM rows_ GROUP BY 1, 2),
         |ex AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
         |       ORDER BY exact_n DESC, user_id LIMIT 10),
         |probe AS (SELECT e.user_id, e.exact_n, g.r AS r,
         |    ${h60Sql("'cms' || CAST(g.r AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")} % 256 AS c
         |  FROM ex e CROSS JOIN (SELECT unnest(range(4)) AS r) g),
         |est AS (SELECT p.user_id, p.exact_n, MIN(cells.cell_count) AS cms_est
         |  FROM probe p JOIN cells ON p.r = cells.r AND p.c = cells.c
         |  GROUP BY 1, 2)
         |SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overestimate
         |FROM est ORDER BY exact_n DESC, user_id""".stripMargin,
    "agg_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS digit
        |  FROM lineitem),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT digit, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM c, t ORDER BY digit""".stripMargin,
    "sketch_hll_registers" ->
      s"""WITH $hllRegSql
         |SELECT register, max_rank FROM regs ORDER BY register""".stripMargin,
    // Self-checking sketches: the engine-private estimate never ships —
    // only exact columns plus the error-bound boolean, which the oracle
    // asserts TRUE. A sketch out of its accuracy contract fails the hash.
    "sketch_hll_users" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sketch_approx_quantiles" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  TRUE AS ok50, TRUE AS ok95, TRUE AS ok99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sketch_hll_estimate" ->
      s"""WITH $hllRegSql,
         |s AS (SELECT COUNT(*) AS m,
         |    CAST(SUM(CASE WHEN max_rank = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |    CAST(SUM(1::BIGINT << (55 - max_rank)) AS BIGINT) AS harmonic_num
         |  FROM regs),
         |e AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events)
         |SELECT m, n_zero, harmonic_num,
         |  7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(harmonic_num AS DOUBLE) AS estimate_raw,
         |  exact_distinct,
         |  (7.09e-1 * 4.096e3 * 3.6028797018963968e16 / CAST(harmonic_num AS DOUBLE)
         |     - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE) * 1.0e2 AS rel_err_pct
         |FROM s, e""".stripMargin,
    "agg_mann_kendall" ->
      """WITH s AS (SELECT l_returnflag, date_trunc('month', l_shipdate) AS mon,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT a.l_returnflag,
        |    CAST(SUM(CASE WHEN b.rev > a.rev THEN 1 WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM s a JOIN s b ON a.l_returnflag = b.l_returnflag AND a.mon < b.mon
        |  GROUP BY 1),
        |ti AS (SELECT l_returnflag, CAST(SUM(t) AS BIGINT) AS n_months,
        |    CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tie_term
        |  FROM (SELECT l_returnflag, rev, COUNT(*) AS t FROM s GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT ti.l_returnflag, n_months, s_stat,
        |  n_months*(n_months-1)*(2*n_months+5) - tie_term AS var_s_x18,
        |  CASE WHEN s_stat > 0 THEN 'increasing' WHEN s_stat < 0 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM ti JOIN p ON ti.l_returnflag = p.l_returnflag
        |ORDER BY 1""".stripMargin,
    "agg_string_agg_nations" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "agg_ols_trend" ->
      """WITH b AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |xs AS (SELECT user_id,
        |    es - MIN(es) OVER (PARTITION BY user_id) AS x, cents FROM b),
        |s AS (SELECT user_id, COUNT(*) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(cents) AS DOUBLE) AS sy,
        |    CAST(SUM(x*cents) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx
        |  FROM xs GROUP BY user_id)
        |SELECT user_id, n,
        |  CASE WHEN n * sxx - sx * sx > 0.0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
        |  END AS slope_cents_per_s,
        |  CASE WHEN n * sxx - sx * sx > 0.0
        |    THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |  END AS intercept_cents
        |FROM s ORDER BY user_id""".stripMargin,
    "agg_skew_kurt" ->
      """WITH r AS (SELECT l_returnflag,
        |  CAST(l_quantity AS BIGINT) AS q
        |FROM lineitem),
        |s AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(q) AS DOUBLE) AS sx,
        |  CAST(SUM(q*q) AS DOUBLE) AS sxx,
        |  CAST(SUM(q*q*q) AS DOUBLE) AS sx3,
        |  CAST(SUM(q*q*q*q) AS DOUBLE) AS sx4
        |FROM r GROUP BY 1),
        |mm AS (SELECT l_returnflag, n, sx, sxx, sx3, sx4, sx / n AS m FROM s),
        |mo AS (SELECT l_returnflag, n, m,
        |  sxx / n - m * m AS m2,
        |  sx3 / n - 3.0 * m * (sxx / n) + 2.0 * m * m * m AS m3,
        |  sx4 / n - 4.0 * m * (sx3 / n) + 6.0 * m * m * (sxx / n)
        |    - 3.0 * m * m * m * m AS m4
        |FROM mm)
        |SELECT l_returnflag, n, m AS mean_qty, m2 AS m2_qty,
        |  m3 / (m2 * sqrt(m2)) AS skew_qty,
        |  m4 / (m2 * m2) - 3.0 AS kurt_qty
        |FROM mo ORDER BY l_returnflag""".stripMargin,
    "agg_dispersion_qty" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  sx / n AS mean_qty,
        |  (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)) AS var_qty,
        |  sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1))) AS stddev_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_mode_priority" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus, o_orderpriority, cnt,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_bool_stats" ->
      """SELECT o_orderpriority,
        |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderstatus = 'F') AS any_final,
        |  CAST(count_if(o_orderstatus = 'O' AND o_totalprice < 50000) AS BIGINT) AS n_small_open
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_histogram_prices" ->
      """SELECT CAST(LEAST(FLOOR(l_extendedprice / 5000.0), 19) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_price,
        |  quantile_cont(l_extendedprice, 0.75) AS p75_price,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
        |  quantile_cont(l_quantity, 0.5) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_pivot_priority_by_status" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_salted_top_users" ->
      s"""SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS total_value,
        |  COUNT(*) AS n_events,
        |  ${Diagnostics.advisedSaltFactorSql("events", "user_id")} AS salt_factor
        |FROM events GROUP BY user_id
        |ORDER BY total_value DESC, user_id LIMIT 20""".stripMargin,
    "join_salted_skew" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS segment,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY segment""".stripMargin,
    "agg_corr_price_qty" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_exact_median_2pass" ->
      """WITH s AS (SELECT l_extendedprice AS v FROM lineitem),
        |ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
        |                  COUNT(*) OVER () AS n FROM s)
        |SELECT v AS median, n AS n_rows FROM ranked WHERE rn = (n + 1) // 2""".stripMargin,
    "agg_weighted_median" ->
      """WITH byval AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY l_returnflag, l_extendedprice),
        |c AS (
        |  SELECT l_returnflag, v, w,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total_w
        |  FROM byval)
        |SELECT l_returnflag, MIN(v) AS weighted_median,
        |  MAX(total_w) AS total_weight
        |FROM c WHERE cum * 2 >= total_w
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sketch_bloom_probe" ->
      """WITH members AS (
        |  SELECT DISTINCT o_custkey AS k FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'),
        |mpos AS (
        |  SELECT k,
        |    list_reduce(list_transform(range(1,16), i ->
        |      CAST(strpos('0123456789abcdef', substr(md5('bloom' || CAST(g.r AS VARCHAR) || ':' || CAST(k AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (a,b) -> a*16+b) % 1024 AS pos
        |  FROM members CROSS JOIN (SELECT unnest(range(4)) AS r) g),
        |bitmap AS (
        |  SELECT pos // 32 AS word,
        |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS wv
        |  FROM mpos GROUP BY 1),
        |cpos AS (
        |  SELECT c_custkey AS k,
        |    list_reduce(list_transform(range(1,16), i ->
        |      CAST(strpos('0123456789abcdef', substr(md5('bloom' || CAST(g.r AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (a,b) -> a*16+b) % 1024 AS pos
        |  FROM customer CROSS JOIN (SELECT unnest(range(4)) AS r) g),
        |probe AS (
        |  SELECT k,
        |    MIN(CAST((COALESCE(wv, 0) >> CAST(pos % 32 AS INTEGER)) & 1 AS BIGINT)) AS maybe
        |  FROM cpos LEFT JOIN bitmap ON cpos.pos // 32 = bitmap.word
        |  GROUP BY k),
        |j AS (
        |  SELECT p.k, p.maybe,
        |    CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member
        |  FROM probe p LEFT JOIN members m ON p.k = m.k)
        |SELECT COUNT(*) AS n_customers,
        |  CAST(SUM(is_member) AS BIGINT) AS n_members,
        |  CAST(SUM(maybe) AS BIGINT) AS n_maybe,
        |  CAST(SUM(CASE WHEN maybe = 1 AND is_member = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
        |  CAST(SUM(CASE WHEN maybe = 1 AND is_member = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / (COUNT(*) - SUM(is_member)) AS fp_rate
        |FROM j""".stripMargin,
    "sketch_cms_users" ->
      """WITH rows_ AS (
        |  SELECT g.r AS sketch_row,
        |    list_reduce(list_transform(range(1,16), k ->
        |      CAST(strpos('0123456789abcdef', substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), k, 1)) - 1 AS BIGINT)),
        |      (a,b) -> a*16+b) % 256 AS sketch_col
        |  FROM events CROSS JOIN (SELECT unnest(range(4)) AS r) g)
        |SELECT CAST(sketch_row AS INTEGER) AS sketch_row, sketch_col,
        |  COUNT(*) AS cell_count
        |FROM rows_ GROUP BY sketch_row, sketch_col
        |ORDER BY sketch_row, sketch_col""".stripMargin
  )
}
