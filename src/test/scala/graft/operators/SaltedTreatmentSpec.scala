package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The advisor-driven salted treatments (r12 verdict item 4): salting is
  * semantics-free at ANY factor, and the gated entries consume exactly
  * the factor `diag_salt_advisor` prescribes for their key. */
class SaltedTreatmentSpec extends SparkSpec {

  private def plainSegments() =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(o_totalprice as decimal(15,2))")).cast("double")
          .as("revenue"))
      .orderBy("c_mktsegment")
      .collect().toSeq

  test("salted skew join equals the plain join at factors 1, 3, 16") {
    val plain = plainSegments()
    Seq(1L, 3L, 16L).foreach { f =>
      val salted = RelationalX.saltedSkewJoinWith(spark, sfDir, f)
        .drop("salt_factor").collect().toSeq
      assert(salted == plain, s"salted join diverged at factor $f")
    }
  }

  test("salted top-users equals the direct aggregation at factors 1, 3, 16") {
    val direct = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(expr("cast(value as decimal(15,2))")).cast("double")
        .as("total_value"),
        count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)
      .collect().toSeq
    Seq(1L, 3L, 16L).foreach { f =>
      val salted = AdvancedAggs.saltedTopUsersWith(spark, sfDir, f)
        .drop("salt_factor").collect().toSeq
      assert(salted == direct, s"salted aggregation diverged at factor $f")
    }
  }

  test("gated treatments apply exactly the advisor's prescribed factor") {
    val advisor = Diagnostics.saltAdvisor(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    val joinApplied = RelationalX.saltedSkewJoin(spark, sfDir)
      .select("salt_factor").head().getLong(0)
    assert(joinApplied == advisor(("orders", "o_custkey")),
      s"join treatment applied $joinApplied, advisor prescribed " +
        s"${advisor(("orders", "o_custkey"))}")
    val aggApplied = AdvancedAggs.saltedTopUsers(spark, sfDir)
      .select("salt_factor").head().getLong(0)
    assert(aggApplied == advisor(("events", "user_id")),
      s"agg treatment applied $aggApplied, advisor prescribed " +
        s"${advisor(("events", "user_id"))}")
  }
}
