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

  test("double-array input (the PQ residual path) equals the float path's arithmetic") {
    val cents = Seq(Seq(1.5, -2.25), Seq(0.0, 4.0))
    val row = spark.sql("SELECT array(cast(0.5 as double), cast(3.0 as double)) AS e")
      .select(GraftPlanShim.column(CentroidSqDists(
        GraftPlanShim.expression(col("e")), cents)).as("d")).head()
    // (0.5-1.5)^2+(3.0+2.25)^2 = 1 + 27.5625; (0.5)^2+(3.0-4.0)^2 = 1.25
    assert(row.getSeq[Double](0) == Seq(28.5625, 1.25))
  }

  test("rejects non-numeric-array input; null input stays null") {
    val cents = Seq(Seq(0.0, 1.0))
    val bad = intercept[Exception] {
      spark.range(1).select(GraftPlanShim.column(CentroidSqDists(
        GraftPlanShim.expression(expr("array('a')")), cents))).collect()
    }
    assert(bad.getMessage.contains("centroid_sq_dists") ||
      bad.getMessage.toLowerCase.contains("data type"))
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS e")
      .select(GraftPlanShim.column(CentroidSqDists(
        GraftPlanShim.expression(col("e")), cents)).as("d")).head()
    assert(nullRow.isNullAt(0))
  }
}
