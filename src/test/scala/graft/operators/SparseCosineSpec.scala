package graft.operators

import graft.SparkSpec

class SparseCosineSpec extends SparkSpec {

  test("postings-join top-5 equals a brute-force driver recompute of " +
    "integer-weighted cosines") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.length.toLong
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, text) =>
      id -> text.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    }.toMap
    val df: Map[String, Long] = tf.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    val w: Map[Long, Map[String, Long]] = tf.map { case (id, m) =>
      id -> m.map { case (t, c) => t -> c * (nd / df(t)) }
    }
    val n2: Map[Long, Long] =
      w.map { case (id, m) => id -> m.values.map(v => v * v).sum }
    def cos(a: Long, b: Long): (Long, Double) = {
      val dot = w(a).iterator.map { case (t, v) => v * w(b).getOrElse(t, 0L) }.sum
      (dot, dot.toDouble / math.sqrt(n2(a).toDouble * n2(b).toDouble))
    }
    val expected = tf.keys.filter(_ < 200).flatMap { a =>
      val ranked = tf.keys.filter(b => b != a).toSeq
        .map { b => val (dot, s) = cos(a, b); (b, dot, s) }
        .filter(_._2 != 0L) // no shared terms → no postings row
        .sortBy { case (b, _, s) => (-s, b) }
        .take(5).zipWithIndex
        .map { case ((b, dot, s), i) => (a, (i + 1).toLong, b, dot, s) }
      ranked
    }.toSet
    val got = TextAnalysis.sparseCosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
  }
}
