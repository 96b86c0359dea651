package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent re-derivations of the graph family at sf0.001: the triangle
  * census is checked against a naive canonical triple-join, PageRank against
  * a driver-side reference implementation over the collected edge list, and
  * components against a driver-side union-find. */
class GraphSpec extends SparkSpec {

  private lazy val edges: Seq[(Long, Long)] =
    Graph.copresenceEdges(spark, sfDir, 1L)
      .select("u1", "u2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("copresence edges are canonical (u1 < u2) and unique") {
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b) => a < b })
    assert(edges.distinct.size == edges.size)
  }

  test("degree distribution satisfies the handshake identity") {
    val dist = Graph.degreeDist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dist.map { case (d, n) => d * n }.sum == 2L * edges.size)
    assert(dist.map(_._2).sum ==
      edges.flatMap(e => Seq(e._1, e._2)).distinct.size)
  }

  test("degree-ordered triangle count equals the naive triple join") {
    // sf0.01: the sf0.001 slice is too sparse to close any triangle, which
    // would make the equality below vacuous
    val dir = "/root/testdata/sf0.01"
    val e01 = Graph.copresenceEdges(spark, dir, 1L)
      .select("u1", "u2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val row = Graph.triangleCount(spark, dir).collect().head
    val (nNodes, nEdges, nTri) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nEdges == e01.size)
    assert(nNodes == e01.flatMap(e => Seq(e._1, e._2)).distinct.size)
    val es = e01.toSet
    val byA = e01.groupBy(_._1)
    val naive = e01.iterator.map { case (a, b) =>
      byA.getOrElse(b, Nil).count { case (_, c) => es.contains((a, c)) }
    }.sum
    assert(nTri == naive)
    assert(nTri > 0, "sf0.01 co-presence graph should close some triangles")
  }

  test("integer PageRank matches a driver-side reference run") {
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    var pr = deg.map { case (v, _) => v -> 1000000L }
    for (_ <- 1 to 3) {
      val contrib = sym.groupBy(_._2).map { case (v, ins) =>
        v -> ins.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = contrib.map { case (v, s) => v -> (150000L + 850L * s / 1000L) }
    }
    val expected = pr.toSeq.sortBy { case (v, p) => (-p, v) }.take(20)
    val got = Graph.pagerankInt(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("component-size histogram matches a driver-side union-find") {
    val e2 = Graph.copresenceEdges(spark, sfDir, 2L)
      .select("u1", "u2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    e2.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.groupBy(find).values.toSeq
      .map(_.size.toLong).groupBy(identity)
      .map { case (sz, cs) => (sz, cs.size.toLong) }.toSeq.sorted
    val got = Graph.ccSizes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
