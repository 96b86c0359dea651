package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The adaptive session-overlap bucket width (r12 verdict item 2):
  * the reported pairs are width-INVARIANT across the whole ladder (the
  * width is a physical knob, never a semantic one), and the adaptive
  * choice is exactly the largest-width-under-budget rule over the
  * measured per-bucket concurrency. */
class OverlapAdaptiveSpec extends SparkSpec {

  test("overlap pairs are identical at every ladder width") {
    val results = Events.OverlapBucketLadder.map { w =>
      w -> Events.sessionOverlapAt(spark, sfDir, w)
        .drop("bucket_s").collect().toSeq
    }
    val (w0, base) = results.head
    assert(base.nonEmpty, "gate corpus must produce overlap pairs")
    results.tail.foreach { case (w, r) =>
      assert(r == base, s"pairs at width $w differ from width $w0")
    }
  }

  test("adaptive width = largest ladder width under the linear pair budget") {
    val s = Events.sessionize(spark, sfDir)
      .filter(col("n_events") >= 2)
      .select(col("session_start").cast("long").as("st"),
        col("session_end").cast("long").as("en"))
    val n = s.count()
    val mass = Events.OverlapBucketLadder.map { w =>
      w -> s.withColumn("bucket",
          explode(expr(s"sequence(st div $w, en div $w)")))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
        .head().getLong(0)
    }.toMap
    val budget = Events.OverlapPairBudgetPerSession * n
    val fitting = Events.OverlapBucketLadder.filter(mass(_) <= budget)
    val expected =
      if (fitting.nonEmpty) fitting.max else Events.OverlapBucketLadder.min
    val chosen = Events.sessionOverlap(spark, sfDir)
      .select("bucket_s").head().getLong(0)
    assert(chosen == expected,
      s"chose $chosen, expected $expected (mass=$mass budget=$budget)")
  }
}
