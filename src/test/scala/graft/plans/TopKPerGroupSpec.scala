package graft.plans

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The native grouped top-k: physical correctness vs the window
  * formulation, plan shape (no sort, exchange on the group key), and the
  * optimizer rewrite in an extensions session. */
class TopKPerGroupSpec extends SparkSpec {

  test("native top-k equals the window row_number formulation exactly") {
    val native = NativeTopK.top3Native(spark, sfDir).collect()
    val window = graft.operators.Windows
      .rankTop3OrdersPerCust(spark, sfDir).collect()
    assert(native.length == window.length)
    assert(native.map(_.toSeq).toSeq == window.map(_.toSeq).toSeq)
  }

  test("native plan uses TopKPerGroupExec with no sort below it") {
    val df = NativeTopK.top3Native(spark, sfDir)
    // unwrap AQE: AdaptiveSparkPlanExec reports no children to collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val execs = plan.collect { case e: TopKPerGroupExec => e }
    assert(execs.nonEmpty, s"no TopKPerGroupExec in:\n$plan")
    // the whole point: no SortExec anywhere under the top-k operator
    import org.apache.spark.sql.execution.SortExec
    val sortsBelow = execs.head.collect { case s: SortExec => s }
    assert(sortsBelow.isEmpty, s"unexpected sort below top-k:\n$plan")
  }

  test("exec reports SQL metrics: input rows, groups, output rows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // topKOf WITHOUT the final orderBy: a range exchange above the exec
    // would sample its input, evaluating the operator twice and doubling
    // the metrics (standard Spark sort behavior, not a bug here)
    val df = NativeTopK.topKOf(
      graft.core.Tables.orders(spark, sfDir)
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    // collect() drives THIS queryExecution's plan (count() builds its own
    // plan instance with separate metric objects)
    val n = df.collect().length.toLong
    // after execution the exec sits inside a materialized ShuffleQueryStage,
    // which is a collect() leaf — descend into stage subtrees explicitly
    def findExec(p: SparkPlan): Seq[TopKPerGroupExec] =
      p.collect { case e: TopKPerGroupExec => e } ++
        p.collect { case q: QueryStageExec => q }.flatMap(q => findExec(q.plan))
    val exec = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
      case p => findExec(p)
    }).head
    val m = exec.metrics
    assert(m("numOutputRows").value == n)
    assert(m("numGroups").value > 0 && m("numGroups").value <= n)
    assert(m("numInputRows").value >= n) // top-k never emits more than it reads
  }

  test("ranks are 1..k per group and bounded by k") {
    val rows = NativeTopK.top3Native(spark, sfDir)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.collect_list("rn").as("rns"))
      .collect()
    rows.foreach { r =>
      val rns = r.getSeq[Int](1).sorted
      assert(rns == (1 to rns.length), s"ranks not dense: $rns")
      assert(rns.length <= 3)
    }
  }

  test("rewrite rule turns a rank-limit window into the native operator") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-topk-rewrite-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      NativeTopK.installWithRewrite(s2)
      val windowShaped = graft.operators.Windows.rankTop3OrdersPerCust(s2, sfDir)
      val optimized = windowShaped.queryExecution.optimizedPlan
      val nodes = optimized.collect { case t: TopKPerGroup => t }
      assert(nodes.nonEmpty, s"rewrite did not fire:\n$optimized")
      assert(nodes.head.k == 3)
      // and the rewritten plan still computes the right answer
      val viaRule = windowShaped.collect().map(_.toSeq).toSeq
      val native = NativeTopK.top3Native(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(viaRule == native)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
