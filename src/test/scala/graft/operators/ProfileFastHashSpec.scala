package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** The production-hash (xxhash64) portable-HLL profile against its md5
  * gate twin: identical plan shape (the swap touches ONE expression, not
  * the dataflow), identical exact statistics, and estimates inside the
  * HLL 3·rsd envelope of the exact distinct counts. */
class ProfileFastHashSpec extends SparkSpec {

  private def shape(plan: String): (Int, Int, Int) = {
    val lines = plan.split("\n").toSeq
    (lines.count(_.contains("Exchange")),
      lines.count(_.contains("HashAggregate")),
      lines.count(l => l.contains("Scan parquet") || l.contains("FileScan")))
  }

  test("xxhash64 profile plans the exact md5 twin shape: 2 scans, " +
    "same exchanges/aggregates, no distinct aggregation anywhere") {
    val li = Tables.lineitem(spark, sfDir)
    val md5Plan = Profile.profileHll(li)
      .queryExecution.executedPlan.toString
    val fastPlan = Profile.profileHll(li, Profile.XxHash60)
      .queryExecution.executedPlan.toString
    assert(!fastPlan.toLowerCase.contains("distinct"),
      "the production profile path must not pay any exact-distinct pass:\n" +
        fastPlan)
    assert(shape(fastPlan) == shape(md5Plan),
      s"plan shape drifted: fast=${shape(fastPlan)} md5=${shape(md5Plan)}")
    assert(shape(fastPlan)._3 == 2,
      s"expected exactly 2 scans (stats + sketch):\n$fastPlan")
  }

  test("xxhash64 estimates inside the 3*rsd envelope; exact stats identical " +
    "to the md5 twin") {
    val li = Tables.lineitem(spark, sfDir)
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2),
          (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))),
          r.getLong(7), r.getDouble(9))
      }.toMap
    val md5 = byCol(Profile.profileHll(li))
    val fast = byCol(Profile.profileHll(li, Profile.XxHash60))
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
        s"$c xxhash64 estimate $est (raw $fraw, zeros $fnz) outside 3*rsd " +
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

  test("null cells never occupy a register on the fast-hash path " +
    "(xxhash64 hashes a null child to a non-null constant; the sketch " +
    "must sentinel the CELL, not trust the hash — r13 advice)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10).toDF("id")
      .withColumn("all_null", lit(null).cast("string"))
      .withColumn("half_null",
        when(col("id") % 2 === 0, concat(lit("v"), col("id"))))
    for (hash <- Seq(Profile.PortableHash60, Profile.XxHash60)) {
      val out = Profile.profileHll(df, hash).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(out("all_null").getLong(out("all_null").fieldIndex("n_zero_regs"))
        == 64L, "an all-null column must leave every register empty")
      assert(out("all_null").getLong(out("all_null").fieldIndex("n_nulls"))
        == 10L)
      // 5 distinct non-null values -> estimate far below the 10+ a
      // phantom null-register would imply; exact small-range check:
      val hn = out("half_null")
      assert(hn.getLong(hn.fieldIndex("n_nulls")) == 5L)
      assert(64L - hn.getLong(hn.fieldIndex("n_zero_regs")) <= 5L,
        "half-null column occupied more registers than its distinct count")
    }
  }
}
