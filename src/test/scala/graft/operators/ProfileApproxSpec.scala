package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** The profiler's approx mode against its exact gate values: every
  * non-distinct statistic must be identical between modes (same single
  * stats aggregate), and every HLL++ distinct estimate must land inside
  * the published 3·rsd error envelope of the exact count. */
class ProfileApproxSpec extends SparkSpec {

  private def byCol(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))
    }.toMap

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val exact = byCol(Profile.profile(df))
    val approx = byCol(Profile.profile(df, approxDistinct = true))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, (nRows, nNulls, nd, mnn, mxn, mns, mxs)) =>
      val (aRows, aNulls, and, amnn, amxn, amns, amxs) = approx(c)
      assert((aRows, aNulls) == (nRows, nNulls), s"$c row/null counts")
      assert((amnn, amxn, amns, amxs) == (mnn, mxn, mns, mxs), s"$c min/max")
      val tol = math.max(3.0 * Profile.ApproxRsd * nd, 1.0)
      assert(math.abs(and - nd) <= tol,
        s"$c approx distinct $and outside 3*rsd of exact $nd")
    }
  }

  test("approx profile within HLL++ bound of the exact gate: orders") {
    check(Tables.orders(spark, sfDir))
  }

  test("approx profile within HLL++ bound of the exact gate: lineitem") {
    check(Tables.lineitem(spark, sfDir))
  }

  test("portable-HLL profile: corrected estimates inside the envelope, exact stats identical") {
    val df = Tables.lineitem(spark, sfDir)
    val exact = byCol(Profile.profile(df))
    val hll = Profile.profileHll(df).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2),
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))),
        r.getLong(7), r.getDouble(9))
    }.toMap
    assert(exact.keySet == hll.keySet)
    exact.foreach { case (c, (nRows, nNulls, nd, mnn, mxn, mns, mxs)) =>
      val (aRows, aNulls, mm, nz, raw) = hll(c)
      assert((aRows, aNulls) == (nRows, nNulls), s"$c row/null counts")
      assert(mm == ((mnn, mxn, mns, mxs)), s"$c min/max")
      // the gate hash-pins the RAW estimate (cross-engine-exact); accuracy
      // is asserted here on the small-range-CORRECTED estimate — linear
      // counting below 2.5m (Flajolet et al. 2007 / HLL++'s regime switch),
      // where ln() can't ride a hash gate
      val m = 64.0
      val est = if (raw <= 2.5 * m && nz > 0) m * math.log(m / nz) else raw
      val tol = math.max(3.0 * (1.04 / math.sqrt(m)) * nd, 2.0)
      assert(math.abs(est - nd) <= tol,
        s"$c portable estimate $est (raw $raw, zeros $nz) outside 3*rsd of exact $nd")
    }
  }

  test("portable-HLL profile plans no distinct aggregation anywhere") {
    val plan = Profile.profileHll(Tables.lineitem(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("distinct"),
      "the 100 TB profile path must not pay any exact-distinct pass:\n" + plan)
  }

  test("approx mode plans no per-column distinct jobs (at most the one " +
    "string-arm join of the split stats pass)") {
    val plan = Profile.profile(Tables.orders(spark, sfDir),
      approxDistinct = true).queryExecution.executedPlan.toString
    // the exact mode cross-joins one aggregate per column (6 joins on
    // orders); the approx mode carries at most ONE join — the 1-row ×
    // 1-row crossJoin of the split stats pass's string min/max arm
    // (immutable agg buffers must not drag the main arm off codegen
    // HashAggregate) — and never a shuffle join
    val joins = plan.split("\n").count(_.contains("Join"))
    assert(joins <= 1, s"approx profile planned $joins joins:\n" + plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the string-arm join must be a 1-row nested-loop, never a shuffle:\n" +
        plan)
    val scans = plan.split("\n").count(l =>
      l.contains("Scan parquet") || l.contains("FileScan"))
    assert(scans <= 2, s"approx profile must not scan per column ($scans):\n" +
      plan)
  }
}
