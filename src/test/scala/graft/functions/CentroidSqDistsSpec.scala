package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftPlanShim
import org.apache.spark.sql.functions._

/** [[CentroidSqDists]]: bit-exact parity with the higher-order-fold
  * formulation it replaced (same ascending-component IEEE accumulation
  * from a 0.0 seed — the contract that keeps every gated distance hash
  * unchanged), on the real embeddings corpus. */
class CentroidSqDistsSpec extends SparkSpec {

  test("native distances equal the HOF fold bit-for-bit on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    // a real-shaped codebook: the first 3 vectors, perturbed
    val cents: Seq[Seq[Double]] = emb.filter(col("vec_id") < 3)
      .orderBy("vec_id")
      .select(expr("transform(embedding, x -> cast(x as double) + 0.125)"))
      .collect().toSeq.map(_.getSeq[Double](0).toSeq)
    val centLit = array(cents.map(c => array(c.map(lit): _*)): _*)
    val hof = transform(
      sequence(lit(0), lit(cents.length - 1)),
      j => aggregate(
        sequence(lit(0), lit(63)), lit(0.0),
        (acc, i) => {
          val d = element_at(col("embedding"), (i + 1).cast("int")).cast("double") -
            element_at(element_at(centLit, (j + 1).cast("int")), (i + 1).cast("int"))
          acc + d * d
        }))
    val nativeD = GraftPlanShim.column(
      CentroidSqDists(GraftPlanShim.expression(col("embedding")), cents))
    val rows = emb.limit(200)
      .select(nativeD.as("got"), hof.as("want")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getSeq[Double](0)
      val want = r.getSeq[Double](1)
      assert(got.size == cents.size && got == want,
        s"native != HOF: $got vs $want")
    }
  }

  test("rejects non-float arrays; null input stays null") {
    val cents = Seq(Seq(0.0, 1.0))
    val bad = intercept[Exception] {
      spark.range(1).select(GraftPlanShim.column(CentroidSqDists(
        GraftPlanShim.expression(expr("array(1.0d)")), cents))).collect()
    }
    assert(bad.getMessage.contains("centroid_sq_dists") ||
      bad.getMessage.toLowerCase.contains("data type"))
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS e")
      .select(GraftPlanShim.column(CentroidSqDists(
        GraftPlanShim.expression(col("e")), cents)).as("d")).head()
    assert(nullRow.isNullAt(0))
  }
}
