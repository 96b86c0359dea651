package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** The production-hash (native-value ordinal-seeded xxhash64) portable-HLL
  * profile against its md5 gate twin: identical plan shape (the swap
  * touches ONE expression, not the dataflow), identical exact statistics,
  * and estimates inside the HLL 3·rsd envelope of the exact distinct
  * counts. Covers the r14-shipped native-cell lever (no per-cell canonical
  * string) alongside the canon-string xxhash intermediate. */
class ProfileFastHashSpec extends SparkSpec {

  private def shape(plan: String): (Int, Int, Int) = {
    val lines = plan.split("\n").toSeq
    (lines.count(_.contains("Exchange")),
      lines.count(_.contains("HashAggregate")),
      lines.count(l => l.contains("Scan parquet") || l.contains("FileScan")))
  }

  test("native-value xxhash64 profile plans the exact md5 twin shape: " +
    "3 scans, same exchanges/aggregates, no distinct aggregation anywhere") {
    val li = Tables.lineitem(spark, sfDir)
    val md5Plan = Profile.profileHll(li)
      .queryExecution.executedPlan.toString
    val fastPlan = Profile.profileHll(li, nativeValues = true)
      .queryExecution.executedPlan.toString
    assert(!fastPlan.toLowerCase.contains("distinct"),
      "the production profile path must not pay any exact-distinct pass:\n" +
        fastPlan)
    assert(shape(fastPlan) == shape(md5Plan),
      s"plan shape drifted: fast=${shape(fastPlan)} md5=${shape(md5Plan)}")
    // 3 scans since the split stats pass: codegen main stats arm +
    // string min/max arm + sketch (column pruning keeps total IO at one
    // read of each parquet page)
    assert(shape(fastPlan)._3 == 3,
      s"expected exactly 3 scans (stats-main + stats-string + sketch):\n" +
        fastPlan)
  }

  test("native path builds no per-cell canonical string: the sketch scan " +
    "carries no concat/date_format where the md5 twin carries both") {
    val li = Tables.lineitem(spark, sfDir)
    val md5Plan = Profile.profileHll(li)
      .queryExecution.executedPlan.toString.toLowerCase
    val fastPlan = Profile.profileHll(li, nativeValues = true)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(md5Plan.contains("concat"),
      "the md5 gate twin is DEFINED by its canonical-string build")
    assert(!fastPlan.contains("concat(pf:") && !fastPlan.contains("pf:"),
      s"native path must not materialize the pf: canon string:\n$fastPlan")
  }

  test("native-value estimates inside the 3*rsd envelope; exact stats " +
    "identical to the md5 twin") {
    val li = Tables.lineitem(spark, sfDir)
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2),
          (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))),
          r.getLong(7), r.getDouble(9))
      }.toMap
    val md5 = byCol(Profile.profileHll(li))
    val fast = byCol(Profile.profileHll(li, nativeValues = true))
    val exact = Profile.profile(li).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(md5.keySet == fast.keySet)
    md5.foreach { case (c, (nRows, nNulls, mm, _, _)) =>
      val (fRows, fNulls, fmm, fnz, fraw) = fast(c)
      assert((fRows, fNulls) == (nRows, nNulls), s"$c row/null counts")
      assert(fmm == mm, s"$c min/max")
      val nd = exact(c)
      val m = 64.0
      val est = if (fraw <= 2.5 * m && fnz > 0) m * math.log(m / fnz) else fraw
      val tol = math.max(3.0 * (1.04 / math.sqrt(m)) * nd, 2.0)
      assert(math.abs(est - nd) <= tol,
        s"$c native estimate $est (raw $fraw, zeros $fnz) outside 3*rsd " +
          s"of exact $nd")
    }
  }

  test("gated fast profile reports every column inside the envelope") {
    val rows = Profile.profileLineitemApproxFast(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("nd_in_envelope")),
        s"column ${r.getString(0)} outside the envelope")
    }
  }

  test("null cells never occupy a register on any hash path " +
    "(xxhash64 hashes a null child to a non-null constant; the sketch " +
    "must sentinel the CELL, not trust the hash — r13 advice)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10).toDF("id")
      .withColumn("all_null", lit(null).cast("string"))
      .withColumn("half_null",
        when(col("id") % 2 === 0, concat(lit("v"), col("id"))))
    val paths: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "md5" -> Profile.profileHll(df),
      "canon-xx" -> Profile.profileHll(df, Profile.XxHash60),
      "native" -> Profile.profileHll(df, nativeValues = true))
    for ((label, profiled) <- paths) {
      val out = profiled.collect().map(r => r.getString(0) -> r).toMap
      assert(out("all_null").getLong(out("all_null").fieldIndex("n_zero_regs"))
        == 64L, s"[$label] an all-null column must leave every register empty")
      assert(out("all_null").getLong(out("all_null").fieldIndex("n_nulls"))
        == 10L, s"[$label]")
      // 5 distinct non-null values -> estimate far below the 10+ a
      // phantom null-register would imply; exact small-range check:
      val hn = out("half_null")
      assert(hn.getLong(hn.fieldIndex("n_nulls")) == 5L, s"[$label]")
      assert(64L - hn.getLong(hn.fieldIndex("n_zero_regs")) <= 5L,
        s"[$label] half-null column occupied more registers than its " +
          "distinct count")
    }
  }

  test("equal values in different columns land independently: the ordinal " +
    "seed plays the pf-prefix's column-separation role") {
    import org.apache.spark.sql.functions._
    // Two columns with IDENTICAL values: if the seed were ignored the two
    // sketches would be register-for-register equal AND any cross-column
    // collision structure would be degenerate. Registers must differ for
    // at least one column pair position across 200 distinct values.
    val df = spark.range(200).toDF("id")
      .withColumn("a", col("id").cast("string"))
      .withColumn("b", col("id").cast("string"))
    val out = Profile.profileHll(df, nativeValues = true).collect()
      .map(r => r.getString(0) ->
        (r.getLong(r.fieldIndex("n_zero_regs")),
          r.getLong(r.fieldIndex("harmonic_num")))).toMap
    assert(out("a") != out("b"),
      "ordinal seed had no effect: identical sketches for identical values " +
        "in distinct columns")
  }
}
