package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** sorted_intersect_count must equal size(array_intersect(..)) on every
  * sorted-distinct input — the precondition the dedup pipelines satisfy —
  * through both the codegen and interpreted paths. */
class SetExpressionsSpec extends SparkSpec {

  private val arrGen: Gen[Seq[Long]] = for {
    n <- Gen.chooseNum(0, 40)
    xs <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
  } yield xs.distinct.sorted

  private def sample(n: Int, seed: Long): Seq[(Seq[Long], Seq[Long])] =
    (0 until n).flatMap { i =>
      for {
        a <- arrGen.apply(Gen.Parameters.default, Seed(seed + 2 * i))
        b <- arrGen.apply(Gen.Parameters.default, Seed(seed + 2 * i + 1))
      } yield (a, b)
    }

  test("merge count equals size(array_intersect) on 200 random sorted pairs") {
    Registry.register(spark)
    import spark.implicits._
    val df = sample(200, 7L).toDF("a", "b")
    val rows = df.select(
      expr("sorted_intersect_count(a, b)").as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("interpreted eval path agrees (empty, disjoint, identical, nested)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    def cnt(a: Seq[Long], b: Seq[Long]): Long =
      SortedIntersectCount(lit(a), lit(b)).eval(null).asInstanceOf[Long]
    assert(cnt(Nil, Nil) == 0L)
    assert(cnt(Seq(1L, 2L, 3L), Nil) == 0L)
    assert(cnt(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) == 0L)
    assert(cnt(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3L)
    assert(cnt(Seq(-5L, 0L, 7L, 9L), Seq(-5L, 7L, 8L)) == 2L)
  }
}
