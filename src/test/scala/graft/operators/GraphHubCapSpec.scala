package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Pins the hub-cap guard's exact semantics where it actually BITES: a
  * synthetic presence table with one viral bucket above [[Graph.HubCap]],
  * one bucket exactly at the cap, and small organic buckets. The capped
  * projection must drop the viral bucket's pairs entirely, keep
  * everything else exactly, and the degree-ordered triangle census must
  * be exact on the retained subgraph (the documented contract: the cap
  * changes WHICH graph is analyzed, never the correctness of the
  * analysis on it). */
class GraphHubCapSpec extends SparkSpec {
  import spark.implicits._

  private val hr0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val hr1 = Timestamp.valueOf("2024-01-01 01:00:00")

  // (user_id, k, hr): bucket (1, hr0) has HubCap+8 users — a hub, all its
  // pairs must vanish; bucket (2, hr0) has exactly HubCap users — at the
  // cap, fully retained; buckets (3, hr0) and (3, hr1) are small triangles
  // / repeat co-presence
  private def presence = {
    val hub = (0L until (Graph.HubCap + 8).toLong).map(u => (u, 1, hr0))
    val atCap = (100L until (100L + Graph.HubCap)).map(u => (u, 2, hr0))
    val small = Seq((200L, 3, hr0), (201L, 3, hr0), (202L, 3, hr0),
      (200L, 3, hr1), (201L, 3, hr1))
    (hub ++ atCap ++ small).toDF("user_id", "k", "hr")
  }

  test("hub bucket contributes no pairs; at-cap and small buckets project exactly") {
    val got = Graph.capAndProject(presence, 1L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute-force expectation over the RETAINED buckets only
    val retained = Seq(
      (100L until (100L + Graph.HubCap)).toSeq -> 1, // k=2 bucket
      Seq(200L, 201L, 202L) -> 1,                    // k=3 hr0
      Seq(200L, 201L) -> 1)                          // k=3 hr1
    val expected = retained.flatMap { case (us, _) =>
      for (a <- us; b <- us if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(got == expected)
    // the cap bit: no pair involves two hub-only users
    val hubOnly = (0L until (Graph.HubCap + 8).toLong).toSet
    assert(got.keys.forall { case (a, b) => !(hubOnly(a) && hubOnly(b)) })
    // at-cap bucket survives whole: HubCap*(HubCap-1)/2 pairs among 100..131
    val atCapPairs = got.keys.count { case (a, b) => a >= 100L && b < 200L }
    assert(atCapPairs == Graph.HubCap * (Graph.HubCap - 1) / 2)
    // repeat co-presence accumulates weight through the retained buckets
    assert(got((200L, 201L)) == 2L)
  }

  test("weight threshold composes with the cap") {
    val got = Graph.capAndProject(presence, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((200L, 201L)), "only the repeated pair survives w >= 2")
  }

  test("triangle census exact on the capped projection") {
    val edges = Graph.capAndProject(presence, 1L).select("u1", "u2")
    val row = Graph.triangleCensus(edges).collect()(0)
    val (nNodes, nEdges, nTri) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val c = Graph.HubCap.toLong
    // retained nodes: the at-cap bucket's 32 + users 200..202
    assert(nNodes == c + 3)
    assert(nEdges == c * (c - 1) / 2 + 3)
    // K_32 has C(32,3) triangles; the small component adds exactly one
    assert(nTri == c * (c - 1) * (c - 2) / 6 + 1)
  }

  test("tighter cap projects a strict subgraph: both census rows dominate") {
    // A bucket surviving cap 16 survives cap 32, so the tight projection's
    // edge set is a SUBSET of the default's — every census column is
    // monotone in the cap. The synthetic at-cap bucket (exactly HubCap
    // users) sits between the two knobs, so the tight row must drop it.
    val loose = Graph.capAndProject(presence, 1L, Graph.HubCap)
      .select("u1", "u2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = Graph.capAndProject(presence, 1L, Graph.TightHubCap)
      .select("u1", "u2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose), "tight-cap edges must be a subset")
    assert(tight.size < loose.size,
      "the at-cap bucket (32 users) must vanish under cap 16")
    // only the small k=3 component survives cap 16 here
    assert(tight == Set((200L, 201L), (200L, 202L), (201L, 202L)))
    val rows = Seq(Graph.TightHubCap.toLong -> tight, Graph.HubCap.toLong -> loose)
    rows.foreach { case (cap, es) =>
      val row = Graph.triangleCensus(
        Graph.capAndProject(presence, 1L, cap).select("u1", "u2")).collect()(0)
      assert(row.getLong(1) == es.size, s"cap $cap edge count")
    }
  }
}
