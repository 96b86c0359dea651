package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The density-adaptive hub cap's selection rule ([[Graph.pickCap]]) and
  * its integration contract: on the sparse gate corpus the chosen cap is
  * the default (so the served edge set — and the cached table — is
  * byte-identical to the fixed-cap one), and the gated census row's
  * numbers agree with the independently-derived default-cap census. The
  * rule itself is pinned where it BITES: a dense histogram must tighten
  * the cap, an over-budget-everywhere histogram must land on the floor. */
class GraphAdaptiveCapPureSpec extends AnyFunSuite {

  test("largest ladder cap within the linear pair budget wins") {
    // n = 100 -> budget 400 pairs; all caps fit -> the default 32
    assert(Graph.pickCap(Map(8L -> 10L, 16L -> 20L, 32L -> 30L), 100L) == 32L)
    // cap-32 projection blows the budget, cap-16 fits -> tighten to 16
    assert(Graph.pickCap(Map(8L -> 10L, 16L -> 380L, 32L -> 5000L), 100L) == 16L)
    // nothing fits -> the floor cap, never a smaller-than-ladder value
    assert(Graph.pickCap(Map(8L -> 450L, 16L -> 500L, 32L -> 600L), 100L) == 8L)
  }

  test("budget boundary is inclusive (pairs == budget still fits)") {
    assert(Graph.pickCap(
      Map(8L -> 0L, 16L -> 0L, 32L -> 4L * 100L), 100L) == 32L)
  }

  test("a ladder cap missing from the measurement never wins") {
    assert(Graph.pickCap(Map(8L -> 1L), 100L) == 8L)
  }
}

class GraphAdaptiveCapSpec extends SparkSpec {

  test("gate corpus is sparse: adaptive cap == default, census rows agree") {
    assert(Graph.adaptiveCap(spark, sfDir) == Graph.HubCap,
      "the gate corpus's bucket histogram fits every ladder entry")
    val adaptive = Graph.adaptiveCapCensus(spark, sfDir).collect().head
    val censusRows = Graph.triangleCensusCapped(spark, sfDir).collect()
    // sparse gate corpus: the census's second operating point IS the
    // advised default cap, marked by the gated `advised` column (r15
    // item 3: the census consumes the advisor instead of a fixed knob)
    assert(censusRows.map(_.getAs[Long]("hub_cap")).toSeq ==
      Seq(Graph.TightHubCap, Graph.HubCap))
    assert(censusRows.map(_.getAs[Long]("advised")).toSeq == Seq(0L, 1L))
    val fixedDefault = censusRows
      .find(_.getAs[Long]("hub_cap") == Graph.HubCap).get
    assert(adaptive.getAs[Long]("hub_cap") == Graph.HubCap)
    assert(adaptive.getAs[Long]("n_nodes") == fixedDefault.getAs[Long]("n_nodes"))
    assert(adaptive.getAs[Long]("n_edges") == fixedDefault.getAs[Long]("n_edges"))
    assert(adaptive.getAs[Long]("n_triangles") ==
      fixedDefault.getAs[Long]("n_triangles"))
    // the selection's inputs are coherent: chosen projection fits budget
    assert(adaptive.getAs[Long]("proj_pairs") <=
      adaptive.getAs[Long]("pairs_budget"))
    assert(adaptive.getAs[Long]("pairs_budget") ==
      Graph.PairBudgetPerRow * adaptive.getAs[Long]("presence_rows"))
  }
}
