package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** KLL-sketch invariants the hash gate can't show: exact weight
  * conservation, bounded size, and the analytic rank-error bound holding
  * across the whole quantile range, not just the three gated targets. */
class KllSpec extends SparkSpec {

  test("retained weights sum exactly to n and the sketch is bounded") {
    val m = Kll.build(spark, sfDir)
    assert(m.rows.map(_._5).sum == m.n,
      "compaction must conserve total weight exactly")
    assert(m.rows.size <= Kll.K * Kll.MaxLevels,
      s"sketch grew past K*levels: ${m.rows.size}")
    // per level, the retained buffer is a partial chunk: < K items
    // (except the terminal retain-all level, absent at this scale)
    m.rows.groupBy(_._1).foreach { case (lvl, rs) =>
      assert(rs.size < Kll.K, s"level $lvl holds ${rs.size} >= K items")
    }
  }

  test("every 5th-percentile target's selected value has true rank inside " +
    "the analytic error bound") {
    val m = Kll.build(spark, sfDir)
    val sorted = m.rows.sortBy(t => (t._4, t._6, t._3))
    val cum = sorted.scanLeft(0L)(_ + _._5).tail
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("v"))
    val targets = (5 to 95 by 5).map { q =>
      val tr = (q * m.n + 99) / 100
      (q, tr, sorted(cum.indexWhere(_ >= tr))._4)
    }
    // one scan: true rank of every selected value
    val conds = targets.map { case (q, _, est) =>
      sum(when(col("v") <= est, 1L).otherwise(0L)).as(s"r$q")
    }
    val row = li.agg(conds.head, conds.tail: _*).head()
    targets.zipWithIndex.foreach { case ((q, tr, est), i) =>
      val trueRank = row.getLong(i)
      assert(math.abs(trueRank - tr) <= m.errBound,
        s"q=$q: |$trueRank - $tr| > ${m.errBound} (est value $est)")
    }
  }
}
