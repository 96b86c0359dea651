package graft.operators

import graft.SparkSpec

class JoinSizeEstimateSpec extends SparkSpec {

  test("cms inner products equal a driver recompute from per-user counts, " +
    "and the estimate never undercounts the exact join size") {
    val rows = Diagnostics.joinSizeEstimate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.length == 4 && rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))

    val ev = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type", "cast(user_id as long) as user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def counts(t: String): Map[Long, Long] = ev.filter(_._1 == t)
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ca = counts("click")
    val cb = counts("purchase")
    val exact = ca.map { case (k, c) => c * cb.getOrElse(k, 0L) }.sum
    def cell(r: Long, k: Long): Long = graft.functions.HashUtil.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"js$r:$k")) % 1024
    val ips = (0L to 3L).map { r =>
      val colsA = ca.groupBy { case (k, _) => cell(r, k) }
        .view.mapValues(_.values.sum).toMap
      val colsB = cb.groupBy { case (k, _) => cell(r, k) }
        .view.mapValues(_.values.sum).toMap
      colsA.map { case (c, s) => s * colsB.getOrElse(c, 0L) }.sum
    }
    rows.foreach { case (r, ip, estMin, ex, na, nb, bound) =>
      assert(ip == ips(r.toInt), s"row $r inner product")
      assert(estMin == ips.min && ex == exact)
      assert(na == ca.values.sum && nb == cb.values.sum)
      // the structural guarantee: a shared cell holds every true pair
      assert(estMin >= exact)
      assert(bound)
    }
  }
}
