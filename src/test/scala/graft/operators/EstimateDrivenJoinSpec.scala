package graft.operators

import graft.SparkSpec

/** Pins [[Diagnostics.estimateDrivenJoin]] (r13 verdict item 6 — the
  * join-size sketch's consumer):
  *
  *  1. STRATEGY-INVARIANCE — all three rungs (broadcast / shuffle /
  *     salted) produce identical (user_id, n_pairs) rows on the real
  *     events corpus, so the decision can never change the answer
  *     (the SaltedTreatmentSpec discipline);
  *  2. the executed plan HONORS the decision — broadcast rung plans a
  *     BroadcastHashJoin, shuffle rung a ShuffledHashJoin/SortMergeJoin,
  *     salted rung joins on the composite (key, salt);
  *  3. the rung selection is the documented threshold ladder over the
  *     memoized CMS estimate, and the estimate never undercounts the
  *     exact join size.
  */
class EstimateDrivenJoinSpec extends SparkSpec {

  private def rows(strategy: String, saltFactor: Long) =
    Diagnostics.estimateDrivenJoinWith(spark, sfDir, strategy, 0L, saltFactor)
      .select("user_id", "n_pairs").collect().toSeq

  test("all three rungs return identical pairs on the real corpus") {
    val b = rows("broadcast", 1L)
    assert(b.nonEmpty)
    assert(rows("shuffle", 1L) == b, "shuffle rung diverged")
    for (f <- Seq(2L, 7L))
      assert(rows("salted", f) == b, s"salted rung (factor $f) diverged")
  }

  test("the executed plan honors the decision") {
    def plan(s: String, f: Long) =
      Diagnostics.estimateDrivenJoinWith(spark, sfDir, s, 0L, f)
        .queryExecution.executedPlan.toString
    assert(plan("broadcast", 1L).contains("BroadcastHashJoin"))
    val sh = plan("shuffle", 1L)
    assert(sh.contains("ShuffledHashJoin") || sh.contains("SortMergeJoin"),
      s"shuffle rung did not plan a shuffle join:\n$sh")
    val sa = plan("salted", 4L)
    assert(sa.contains("salt"), s"salted rung lost the salt key:\n$sa")
  }

  test("rung selection follows the ladder and the estimate never undercounts") {
    val est = Diagnostics.cmsJoinEstimate(spark, sfDir)
    val exact = {
      import org.apache.spark.sql.functions._
      val ev = graft.core.Tables.events(spark, sfDir)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu")), col("user_id") === col("pu"))
        .count()
    }
    assert(est >= exact, s"CMS estimate $est undercounts exact $exact")
    val expected =
      if (est <= Diagnostics.EstBroadcastMax) "broadcast"
      else if (est >= Diagnostics.EstSaltMin) "salted"
      else "shuffle"
    val out = Diagnostics.estimateDrivenJoin(spark, sfDir)
      .select("strategy", "est_rows", "salt_factor").head()
    assert(out.getString(0) == expected)
    assert(out.getLong(1) == est)
    if (expected != "salted") assert(out.getLong(2) == 1L)
  }
}
