package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards for the scale-safe ranking arithmetic and the aggregation
  * equivalences the bench queries rely on. */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form ntile equals Spark's built-in for every n in 1..40, k in 1..5") {
    for (n <- 1 to 40; k <- 1 to 5) {
      val df = (1 to n).map(_.toLong).toDF("rn")
      val builtin = df
        .withColumn("q", ntile(k).over(Window.orderBy(col("rn"))))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val closed = df
        .withColumn("q", Windows.ntileBucket(k.toLong, n.toLong)(col("rn")))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(closed == builtin, s"n=$n k=$k")
    }
  }

  test("salted two-stage aggregation equals direct aggregation") {
    val direct = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(15,2)")).cast("double").as("total_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val salted = AdvancedAggs.saltedTopUsers(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == direct)
  }

  test("HLL sketch counts stay within the configured error of exact counts") {
    // sketch_hll_users self-checks in-query since round 6: the output rows
    // carry (event_type, n_events, exact_users, within_10pct). The spec
    // verifies the in-query exact counts against an independent computation
    // and that the sketch's accuracy-contract boolean held everywhere.
    val rows = AdvancedAggs.sketchDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("exact_users"),
        r.getAs[Boolean]("within_10pct"))).toMap
    val exact = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val (got, ok) = rows(k)
      assert(got == ex, s"$k: exact_users $got vs independent $ex")
      assert(ok, s"$k: approx_count_distinct drifted outside 10% of $ex")
    }
  }

  test("approx quantiles respect the configured rank-error bound vs exact order stats") {
    // sketch_approx_quantiles self-checks in-query since round 6: each
    // estimate is banded between exact percentile(p ± 0.01) bounds and the
    // output carries (l_returnflag, n_rows, ok50, ok95, ok99). The spec
    // re-verifies n_rows independently and that every band boolean held.
    val rows = AdvancedAggs.sketchQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        Seq(r.getAs[Boolean]("ok50"), r.getAs[Boolean]("ok95"),
          r.getAs[Boolean]("ok99")))).toMap
    val exactN = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exactN.keySet)
    exactN.foreach { case (flag, n) =>
      val (gotN, oks) = rows(flag)
      assert(gotN == n, s"$flag: n_rows $gotN vs independent $n")
      assert(oks.forall(identity),
        s"$flag: approx_percentile outside its p±0.01 rank band: $oks")
    }
  }
}
