package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing must eliminate the join-time shuffle: both sides of a
  * bucket-key join arrive pre-partitioned, so the physical plan has no
  * Exchange. This is the ingest-once/join-free pattern for 100 TB fact
  * tables. */
class BucketingSpec extends SparkSpec {

  test("join on the bucket key runs with zero exchanges") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = graft.core.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(
      ord.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bucketed", "l_orderkey", 4)

    val joined = Bucketing.readTable(spark, "li_bucketed")
      .join(Bucketing.readTable(spark, "ord_bucketed"), "l_orderkey")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("q"))
    // disable auto-broadcast so the join strategy is the bucket-aware SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
