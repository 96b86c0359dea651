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
}
