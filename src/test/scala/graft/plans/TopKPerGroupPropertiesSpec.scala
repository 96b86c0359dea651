package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential properties for the native top-k: on random skewed inputs
  * (duplicate keys, tied order values, negative values, empty-ish groups)
  * the operator must equal the window formulation row-for-row; and the
  * rewrite rule must NOT touch window shapes it can't preserve. */
class TopKPerGroupPropertiesSpec extends SparkSpec {

  private case class R(g: Int, id: Long, v: Double)

  private val rowGen: Gen[R] = for {
    g <- Gen.chooseNum(0, 12) // few groups → heavy duplication
    id <- Gen.chooseNum(0L, 5000L)
    v <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_.toDouble), // many ties
      Gen.chooseNum(-1000.0, 1000.0))
  } yield R(g, id, v)

  private def sample(n: Int, seed: Long): Seq[R] =
    (0 until n).flatMap(i => rowGen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("native top-k equals the window formulation on 5 random datasets") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      // distinct ids per group make the ordering total (row_number is only
      // well-defined under a total order — same contract as the rule docs)
      val data = sample(400, seed * 1000L)
        .groupBy(r => (r.g, r.id)).map(_._2.head).toSeq
      val df = data.map(r => (r.g, r.id, r.v)).toDF("g", "id", "v")
      val k = 1 + seed % 4
      NativeTopK.install(spark)
      val child = df.queryExecution.analyzed
      def attr(n: String) = child.output.find(_.name == n).get
      val node = TopKPerGroup(Seq(attr("g")),
        Seq(SortOrder(attr("v"), Descending), SortOrder(attr("id"), Ascending)),
        k, AttributeReference("rn", IntegerType, nullable = false)(), child)
      val native = org.apache.spark.sql.GraftPlanShim.ofRows(spark, node)
        .orderBy("g", "rn").collect().map(_.toSeq)
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val window = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .orderBy("g", "rn").collect().map(_.toSeq)
      assert(native.toSeq == window.toSeq, s"seed=$seed k=$k")
    }
  }

  test("rewrite leaves non-row_number rank windows untouched") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .appName("graft-topk-negative")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false").getOrCreate()
      NativeTopK.installWithRewrite(s2)
      import s2.implicits._
      val df = Seq((1, 10.0), (1, 10.0), (2, 5.0)).toDF("g", "v")
      // rank() keeps ties — k rows is not guaranteed, so no rewrite allowed
      val ranked = df.withColumn("rn",
          rank().over(Window.partitionBy(col("g")).orderBy(col("v").desc)))
        .filter(col("rn") <= 1)
      val nodes = ranked.queryExecution.optimizedPlan.collect {
        case t: TopKPerGroup => t
      }
      assert(nodes.isEmpty, "rank() window must not be rewritten")
      assert(ranked.count() == 3) // both tied rows of group 1 kept
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
