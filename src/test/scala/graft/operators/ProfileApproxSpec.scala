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

  test("approx mode plans ONE aggregate job (no per-column distinct jobs)") {
    val plan = Profile.profile(Tables.orders(spark, sfDir),
      approxDistinct = true).queryExecution.executedPlan.toString
    // the exact mode cross-joins one aggregate per column; the approx
    // mode must contain no join at all — a single scan feeding a single
    // two-level aggregate
    assert(!plan.contains("Join"), "approx profile must be join-free:\n" + plan)
  }
}
