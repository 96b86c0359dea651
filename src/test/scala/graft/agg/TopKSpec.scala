package graft.agg

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The bounded top-k Aggregator must behave like sort-then-take-k no matter
  * how rows are split across partial buffers — the associativity/identity
  * laws Spark's partial aggregation relies on. */
class TopKSpec extends SparkSpec {

  private val agg = new TopK.TopKOrders(3)

  private def rows(n: Int, seed: Long): List[(Long, Long, Double)] = {
    val gen = Gen.listOfN(n, for {
      key <- Gen.choose(1L, 1000L)
      price <- Gen.choose(0, 500000).map(_ / 100.0)
    } yield (1L, key, price))
    gen.apply(Gen.Parameters.default, Seed(seed)).get
      // unique orderkeys, as in the orders table
      .groupBy(_._2).map(_._2.head).toList
  }

  private def expected(rs: List[(Long, Long, Double)]) =
    rs.sortBy { case (_, key, price) => (-price, key) }.take(3)
      .zipWithIndex.map { case ((_, key, price), i) => (key, price, i + 1) }

  test("reduce-only fold equals sort-then-take-k (50 random cases)") {
    for (seed <- 1 to 50) {
      val rs = rows(20, seed.toLong)
      val buf = rs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(buf) == expected(rs), s"seed $seed")
    }
  }

  test("merge is split-invariant: any partitioning gives the same top-k") {
    for (seed <- 1 to 30) {
      val rs = rows(24, 100L + seed)
      val whole = agg.finish(rs.foldLeft(agg.zero)(agg.reduce))
      for (cut <- List(0, 1, rs.size / 2, rs.size)) {
        val (l, r) = rs.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged) == whole, s"seed $seed cut $cut")
        // and with operand order flipped
        val mergedRev = agg.merge(
          r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(mergedRev) == whole, s"seed $seed cut $cut (flipped)")
      }
    }
  }

  test("zero is the merge identity") {
    val rs = rows(10, 999L)
    val buf = rs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(buf, agg.zero) == buf)
    assert(agg.merge(agg.zero, buf) == buf)
  }
}
