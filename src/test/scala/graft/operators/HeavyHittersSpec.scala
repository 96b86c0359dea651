package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra-Gries candidate phase must be lossless for the configured
  * threshold: heavy hitters via the two-phase path equal the naive
  * full-aggregation answer exactly, on the real corpus and on adversarial
  * synthetic streams. */
class HeavyHittersSpec extends SparkSpec {

  test("two-phase heavy hitters equal the naive aggregation on documents") {
    val twoPhase = TextAnalysis.heavyHitters(spark, sfDir)
      .select("token", "cnt").collect().map(r => (r.getString(0), r.getLong(1)))
    val tok = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val n = tok.count()
    val naive = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > n.toDouble / 200.0)
      .orderBy(col("cnt").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(twoPhase.toSeq == naive.toSeq)
    assert(twoPhase.nonEmpty, "corpus unexpectedly has no heavy tokens")
  }

  test("MG counters never drop an item above n/k, even adversarially ordered") {
    // stream: one item at frequency just above n/k buried in k distinct
    // light items repeated round-robin (the classic MG adversary)
    val k = 50
    val heavy = Seq.fill(300)("HH")
    val light = (0 until 2000).map(i => s"t${i % 997}")
    val stream = (light ++ heavy ++ light).iterator // n = 4300, n/k = 86
    val cands = TextAnalysis.mgCandidates(stream, k).toSet
    assert(cands.contains("HH"), s"true heavy hitter lost; kept: ${cands.take(10)}")
  }
}
