package graft.operators

import graft.SparkSpec

/** Pins [[Diagnostics.estimateDrivenAgg]] (r14 verdict item 7 — the
  * aggregation side of the estimate→execution loop):
  *
  *  1. STRATEGY-INVARIANCE — the plain single-stage and the two-stage
  *     salted rollup produce identical (user_id, total_value, n_events)
  *     rows at any factor (decimal partials are order-independent), so
  *     the decision can never change the answer;
  *  2. the executed plan HONORS the decision — the salted arm carries
  *     the composite (user_id, salt) pre-aggregation, the plain arm
  *     has no salt key anywhere;
  *  3. the strategy and factor follow the documented budget ladder over
  *     the memoized CMS hot-key estimate, and the estimate never
  *     undercounts the exact hottest-key count.
  */
class EstimateDrivenAggSpec extends SparkSpec {

  private def rows(strategy: String, saltFactor: Long) =
    Diagnostics.estimateDrivenAggWith(spark, sfDir, strategy, 0L, saltFactor)
      .select("user_id", "total_value", "n_events").collect().toSeq

  test("plain and salted arms return identical rollups at any factor") {
    val plain = rows("plain", 1L)
    assert(plain.nonEmpty)
    for (f <- Seq(2L, 6L, 31L))
      assert(rows("salted", f) == plain, s"salted arm (factor $f) diverged")
  }

  test("the executed plan honors the decision") {
    def plan(s: String, f: Long) =
      Diagnostics.estimateDrivenAggWith(spark, sfDir, s, 0L, f)
        .queryExecution.executedPlan.toString
    def aggLevels(p: String) =
      p.split("\n").count(_.contains("HashAggregate"))
    val salted = plan("salted", 4L)
    val plain = plan("plain", 1L)
    // two two-level aggregations vs one; and the salt source column
    // event_id reaches only the salted scan (the plain arm's pruned scan
    // proves no salt expression survives anywhere in it)
    assert(aggLevels(salted) == 4 && salted.contains("event_id"),
      s"salted arm lost the composite pre-aggregation stage:\n$salted")
    assert(aggLevels(plain) == 2 && !plain.contains("event_id"),
      s"plain arm must be one single-stage aggregation with a pruned scan:\n" +
        plain)
  }

  test("strategy and factor follow the budget ladder; the estimate never " +
    "undercounts the exact hottest key") {
    import org.apache.spark.sql.functions._
    val est = Diagnostics.cmsHotKeyEstimate(spark, sfDir)
    val exactMax = graft.core.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(est >= exactMax, s"CMS hot-key estimate $est undercounts $exactMax")
    val expectedStrategy =
      if (est > Diagnostics.AggHotKeyBudget) "salted" else "plain"
    val expectedFactor =
      if (expectedStrategy == "salted")
        math.min((est + Diagnostics.AggHotKeyBudget - 1) /
          Diagnostics.AggHotKeyBudget, Diagnostics.SaltMaxFactor)
      else 1L
    val out = Diagnostics.estimateDrivenAgg(spark, sfDir)
      .select("est_hot", "strategy", "salt_factor").head()
    assert(out.getLong(0) == est)
    assert(out.getString(1) == expectedStrategy)
    assert(out.getLong(2) == expectedFactor)
  }
}
