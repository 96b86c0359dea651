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
    val approx = AdvancedAggs.sketchDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("approx quantiles respect the configured rank-error bound vs exact order stats") {
    // approx_percentile(accuracy=1000) guarantees rank error <= 1/1000;
    // assert the looser 1/100 so the check is robust, not flaky
    val approx = AdvancedAggs.sketchQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val byFlag = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    val qs = Seq(0.5, 0.95, 0.99)
    val eps = 0.01
    approx.foreach { case (flag, vals) =>
      val xs = byFlag(flag)
      val n = xs.length
      qs.zip(vals).foreach { case (q, v) =>
        val lo = xs(math.max(0, math.ceil((q - eps) * n).toInt - 1))
        val hi = xs(math.min(n - 1, math.ceil((q + eps) * n).toInt - 1))
        assert(v >= lo && v <= hi, s"$flag q=$q: approx $v outside rank band [$lo, $hi]")
      }
    }
  }
}
