package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench artifact's JSON shape and its self-adjudication layer
  * WITHOUT a bench run, by replaying the exact conditions that polluted
  * BENCH_r09: six top-20 entries inflated 3.6-9.6x by episodic host steal
  * while the (then single-thread) calibration series read "clean". The
  * contract proven here: an artifact produced under those conditions now
  * flags the affected queries ITSELF, via either the rep-spread detector
  * (post-warmup reps disagree >= 3x) or the calibration-window detector
  * (a bracketing checkpoint >= 1.5x the run's floor) — and the headline
  * line can NEVER outgrow the driver's ~2000-char tail capture again
  * (BENCH_r15's `parsed: null`): every variable-length field is bounded
  * (count + top-N), the full lists live on their own earlier lines, and
  * the worst-case replay below asserts the hard ceiling. */
class BenchJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  // Round-9 replay: four queries, calibEvery = 2 -> checkpoint 0 precedes
  // the run, checkpoint 1 lands after query index 1, checkpoint 2 after
  // index 3. The steal burst spans the second window (indices 2-3),
  // inflating ALL reps of "w_allreps" (the case rep-spread cannot see) and
  // spiking checkpoint 2 to 2.0s vs the 0.5s floor.
  private val rs = Seq(
    Bench.QRes("a_clean", Vector(1.0, 0.5, 0.5), ok = true),
    Bench.QRes("b_spread", Vector(1.0, 3.0, 0.6), ok = true), // min survives, but 3.0/0.6=5x
    Bench.QRes("w_allreps", Vector(9.0, 9.5, 9.3), ok = true), // converged 9.3 is PURE steal
    Bench.QRes("z_jitter", Vector(0.02, 0.04, 0.01), ok = true)) // 4x ratio but sub-floor
  private val calibs = IndexedSeq(0.5, 0.52, 2.0)
  private val lines = Bench.renderLines(rs, calibs, calibEvery = 2, sfDir = "/sf")

  test("every emitted line is valid standalone JSON with its metric key") {
    assert(lines.length == 8)
    val metrics = lines.map { l =>
      val node = mapper.readTree(l) // throws on malformed JSON
      node.get("metric").asText()
    }
    assert(metrics == Seq(
      "per_query_converged", "per_query_reps", "per_query_first",
      "per_query_build", "cache_builds", "suspects", "cross_round_anomalies",
      "total"))
  }

  test("per_query_reps preserves every rep of every query") {
    val reps = mapper.readTree(lines(1)).get("reps")
    assert(reps.size() == 4)
    val b = reps.get("b_spread")
    assert(b.size() == 3)
    assert(math.abs(b.get(1).asDouble() - 3.0) < 1e-9,
      "the inflated middle rep must survive into the artifact verbatim")
  }

  test("rep-spread detector flags the query whose post-warmup reps disagree 3x") {
    val susp = mapper.readTree(lines(5))
    val flagged = (0 until susp.get("rep_spread_suspects").size())
      .map(susp.get("rep_spread_suspects").get(_).asText())
    assert(flagged == Seq("b_spread"),
      "exactly the wide-spread query; NOT the sub-0.5s jitter query")
    val head = mapper.readTree(lines(7))
    assert(head.get("n_rep_spread_suspects").asInt() == 1)
    assert(head.get("rep_spread_top").get(0).asText() == "b_spread")
  }

  test("calibration-window detector flags all-rep inflation invisible to spread") {
    val susp = mapper.readTree(lines(5))
    val flagged = (0 until susp.get("calib_suspect_queries").size())
      .map(susp.get("calib_suspect_queries").get(_).asText())
    // window 2 (indices 2-3) is bracketed by the 2.0s checkpoint
    assert(flagged == Seq("w_allreps", "z_jitter"),
      "every query in the polluted window is untrustworthy, spread or not")
    val head = mapper.readTree(lines(7))
    assert(head.get("calib_max_over_min").asDouble() >= 3.0)
    assert(head.get("n_calib_suspects").asInt() == 2)
  }

  test("headline keeps converged totals, top20 map and bounded failure view") {
    val head = mapper.readTree(lines(7))
    assert(head.get("n_queries").asInt() == 4)
    assert(head.has("top20_queries") && !head.has("queries"),
      "full map must NOT ride the headline (tail-truncation hazard)")
    // the unbounded lists must NOT ride the headline either — the r15
    // overflow came from exactly these keys growing with the flag count
    assert(!head.has("failed") && !head.has("rep_spread_suspects") &&
      !head.has("calib_suspect_queries") && !head.has("cross_round_anomalies"),
      "unbounded list keys are banned from the headline")
    assert(math.abs(head.get("value").asDouble() - (0.5 + 0.6 + 9.3 + 0.01)) < 1e-6)
    assert(head.get("n_failed").asInt() == 0)
    assert(head.get("failed_top").size() == 0)
  }

  test("headline stays under the hard ceiling on a worst-case run: every " +
    "inventory query failed AND suspect in both detectors AND a full " +
    "anomaly batch (the BENCH_r15 overflow replay)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.length >= 300, "replay should use the real 300+ inventory")
    // all reps spread >= 3x and slow -> every query rep-spread-flags;
    // ok=false -> every query in the failed list
    val worst = names.map(n => Bench.QRes(n, Vector(9.0, 9.0, 2.0), ok = false))
    // alternating burst checkpoints (calibEvery = 1): every query window
    // is bracketed by at least one 10x-median spike -> all calib-suspect
    val badCalibs = IndexedSeq.tabulate(names.length + 1)(
      i => if (i % 2 == 1) 5.0 else 0.5)
    val anomalies = names.take(12).map(n =>
      Bench.Anomaly(n, 1.0, Vector(9.0, 9.0, 2.0), Vector(1.0, 1.1, 1.2)))
    val ls = Bench.renderLines(worst, badCalibs, calibEvery = 1,
      sfDir = "/root/testdata/sf0.1", anomalies = anomalies)
    val head = ls.last
    assert(head.length <= Bench.HeadlineMaxChars,
      s"worst-case headline is ${head.length} chars — over the " +
        s"${Bench.HeadlineMaxChars} ceiling the driver tail capture needs")
    val node = mapper.readTree(head)
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() > 0.0)
    assert(node.get("n_failed").asInt() == names.length)
    assert(node.get("n_rep_spread_suspects").asInt() == names.length)
    assert(node.get("n_calib_suspects").asInt() == names.length)
    assert(node.get("n_anomalies").asInt() == 12)
    assert(node.get("failed_top").size() == Bench.HeadlineTopN)
    // the full lists survive on their own lines
    val susp = mapper.readTree(ls(5))
    assert(susp.get("failed").size() == names.length)
    assert(susp.get("rep_spread_suspects").size() == names.length)
    assert(susp.get("calib_suspect_queries").size() == names.length)
    assert(mapper.readTree(ls(6)).get("anomalies").size() == 12)
  }

  test("a clean flat run flags nothing") {
    val clean = Seq(
      Bench.QRes("q1", Vector(1.0, 0.5, 0.5), ok = true),
      Bench.QRes("q2", Vector(2.0, 1.1, 1.0), ok = true))
    val ls = Bench.renderLines(clean, IndexedSeq(0.5, 0.55, 0.52), 1, "/sf")
    val susp = mapper.readTree(ls(5))
    assert(susp.get("rep_spread_suspects").size() == 0)
    assert(susp.get("calib_suspect_queries").size() == 0)
    assert(mapper.readTree(ls(7)).get("calib_max_over_min").asDouble() < 1.3)
  }

  test("worst-of-N scheduling tail does not pollute a clean run's flags") {
    // Measured clean-host series (12 checkpoints spanning 0.30-0.49 s):
    // anchoring the pollution floor at the MIN flags half the run; the
    // median floor keeps a clean run clean while a real burst (multiples
    // of the median) still trips the 1.5x gate.
    val clean = Seq(
      Bench.QRes("q1", Vector(1.0, 0.5, 0.5), ok = true),
      Bench.QRes("q2", Vector(1.0, 0.5, 0.5), ok = true),
      Bench.QRes("q3", Vector(1.0, 0.5, 0.5), ok = true),
      Bench.QRes("q4", Vector(1.0, 0.5, 0.5), ok = true))
    val tailCalibs = IndexedSeq(0.30, 0.45, 0.47, 0.49, 0.44)
    val susp = mapper.readTree(Bench.renderLines(clean, tailCalibs, 1, "/sf")(5))
    assert(susp.get("calib_suspect_queries").size() == 0,
      "scheduling-tail spread around the median must not flag")
  }

  test("cache_builds line itemizes ingest-amortized costs and rides the headline") {
    val clean = Seq(Bench.QRes("q1", Vector(1.0, 0.5, 0.5), ok = true))
    val ls = Bench.renderLines(clean, IndexedSeq(0.5, 0.5), 1, "/sf",
      builds = Map("table:graft_edges" -> 8.25, "model:kmeans" -> 1.5))
    val cb = mapper.readTree(ls(4))
    assert(cb.get("metric").asText() == "cache_builds")
    assert(math.abs(cb.get("total_build_s").asDouble() - 9.75) < 1e-6)
    assert(math.abs(cb.get("builds").get("table:graft_edges").asDouble() - 8.25) < 1e-6)
    // the headline (tail-survivable line) carries the aggregate too
    val head = mapper.readTree(ls(7))
    assert(math.abs(head.get("ingest_build_s").asDouble() - 9.75) < 1e-6,
      "converged totals must be readable alongside the excluded build cost")
  }

  test("per_query_build attributes one-time builds to the query that ran them") {
    val withBuilds = Seq(
      Bench.QRes("q_cold", Vector(12.0, 2.0, 1.9), ok = true,
        builds = Map("table:graft_coedges" -> 8.25, "model:kmeans" -> 1.5)),
      Bench.QRes("q_warm", Vector(1.0, 0.5, 0.5), ok = true))
    val ls = Bench.renderLines(withBuilds, IndexedSeq(0.5, 0.5), 1, "/sf")
    val pb = mapper.readTree(ls(3))
    assert(pb.get("metric").asText() == "per_query_build")
    val q = pb.get("queries")
    assert(q.has("q_cold") && !q.has("q_warm"),
      "only queries that triggered a build carry an attribution row")
    assert(math.abs(q.get("q_cold").get("build_s").asDouble() - 9.75) < 1e-6)
    assert(math.abs(q.get("q_cold").get("builds").get("table:graft_coedges")
      .asDouble() - 8.25) < 1e-6)
  }

  test("steal stamp: a 2x-median calibration checkpoint marks the headline " +
    "polluted, the clean scheduling tail does not") {
    // clean spread measured on this host: 0.30-0.49 (max/median ~1.4)
    val clean = IndexedSeq(0.30, 0.35, 0.38, 0.49, 0.33)
    assert(!Bench.stealPolluted(clean), "clean tail must not stamp")
    // the r9 burst shape: one checkpoint at 2.79x the median
    val burst = IndexedSeq(0.33, 0.35, 0.98, 0.36, 0.34)
    assert(Bench.stealPolluted(burst), "a 2x+ burst must stamp")
    val rs = Seq(Bench.QRes("q", Vector(1.0, 1.0), ok = true))
    val cleanLine = Bench.renderLines(rs, clean, 1, "/sf").last
    val burstLine = Bench.renderLines(rs, burst, 1, "/sf").last
    assert(mapper.readTree(cleanLine).get("steal_polluted").asBoolean() == false)
    assert(mapper.readTree(burstLine).get("steal_polluted").asBoolean() == true)
  }

  test("cross-round gate flags the uniformly-slow shape the within-run " +
    "stamps cannot see (r14 agg_spearman replay)") {
    // prior round's converged map: w_allreps was 1.0s; this round its
    // EVERY rep reads ~9s (a state/allocation artifact spanning the whole
    // window — rep-spread sees nothing, calib may read clean).
    val prior = Map("a_clean" -> 0.45, "w_allreps" -> 1.0, "z_jitter" -> 0.001)
    assert(Bench.crossRoundAnomalies(rs, prior) == Seq("w_allreps"))
    // clean query at ~prior: not flagged; sub-floor jitter 10x: not
    // flagged; b_spread (converged 0.6, no prior entry): not flagged
    assert(Bench.crossRoundAnomalies(rs, Map.empty[String, Double]).isEmpty,
      "no prior map (first round / sf mismatch) must disable the gate")
    // a genuine regression also flags — the gate's job is to force the
    // adjudication, not to presume the artifact reading
    val regressed = Seq(Bench.QRes("q", Vector(8.0, 7.5, 7.8), ok = true))
    assert(Bench.crossRoundAnomalies(regressed, Map("q" -> 2.0)) == Seq("q"))
  }

  test("adjudication reps join the rep vector: a run artifact self-heals, " +
    "a genuine regression keeps its number") {
    val artifact = Bench.Anomaly("w_allreps", 1.0, Vector(9.0, 9.5, 9.3),
      Vector(1.2, 1.1, 1.05))
    val genuine = Bench.Anomaly("r_real", 1.0, Vector(9.0, 9.5, 9.3),
      Vector(9.4, 9.2, 9.6))
    val rs2 = Seq(
      Bench.QRes("w_allreps", Vector(9.0, 9.5, 9.3), ok = true),
      Bench.QRes("r_real", Vector(9.0, 9.5, 9.3), ok = true),
      Bench.QRes("untouched", Vector(1.0, 0.5), ok = true))
    val healed = Bench.mergeAdjudications(rs2, Seq(artifact, genuine))
      .map(r => r.name -> r.converged).toMap
    assert(math.abs(healed("w_allreps") - 1.05) < 1e-9,
      "fresh isolated reps must heal the artifact's converged")
    assert(math.abs(healed("r_real") - 9.2) < 1e-9,
      "a genuine regression must keep its slow converged")
    assert(math.abs(healed("untouched") - 0.5) < 1e-9)
    // an unadjudicated overflow record (empty reps) must not touch the query
    val overflow = Bench.Anomaly("w_allreps", 1.0, Vector(9.0, 9.5), Vector.empty)
    assert(math.abs(Bench.mergeAdjudications(rs2, Seq(overflow))
      .find(_.name == "w_allreps").get.converged - 9.3) < 1e-9)
  }

  test("a self-healed anomaly does not re-enter rep_spread_suspects: the " +
    "spread detector runs over the PRE-MERGE suite reps") {
    // Uniformly-slow suite reps (no spread) healed by fast adjudication
    // reps: the merged vector spreads 9.5/1.05 > 3x by construction, but
    // the detector must judge the suite reps alone (r15 advice — every
    // healed anomaly was diluting the spread list's meaning).
    val healedQ = Bench.QRes("w_allreps",
      Vector(9.0, 9.5, 9.3, 1.2, 1.1, 1.05), ok = true)
    val anomalies = Seq(Bench.Anomaly("w_allreps", 1.0,
      Vector(9.0, 9.5, 9.3), Vector(1.2, 1.1, 1.05)))
    val ls = Bench.renderLines(Seq(healedQ), IndexedSeq(0.5, 0.5), 1, "/sf",
      anomalies = anomalies)
    val susp = mapper.readTree(ls(5))
    assert(susp.get("rep_spread_suspects").size() == 0,
      "suite reps were spread-free; the merged fast reps must not flag")
    // converged still reads the healed minimum
    assert(math.abs(mapper.readTree(ls(7)).get("value").asDouble() - 1.05) < 1e-9)
    // and a query whose SUITE reps genuinely spread still flags even
    // when it was also adjudicated
    val spreadQ = Bench.QRes("b_spread",
      Vector(1.0, 3.0, 0.6, 0.55, 0.57, 0.56), ok = true)
    val a2 = Seq(Bench.Anomaly("b_spread", 0.2,
      Vector(1.0, 3.0, 0.6), Vector(0.55, 0.57, 0.56)))
    val susp2 = mapper.readTree(Bench.renderLines(Seq(spreadQ),
      IndexedSeq(0.5, 0.5), 1, "/sf", anomalies = a2)(5))
    assert(susp2.get("rep_spread_suspects").size() == 1)
  }

  test("cross_round_anomalies line records prior, suite and adjudication " +
    "reps; the headline carries only count + names") {
    val anomalies = Seq(Bench.Anomaly("w_allreps", 2.49,
      Vector(22.5, 22.4, 22.6), Vector(3.2, 3.16, 3.3)))
    val ls = Bench.renderLines(rs, calibs, 2, "/sf", anomalies = anomalies)
    val node = mapper.readTree(ls(6)).get("anomalies")
    val a = node.get("w_allreps")
    assert(math.abs(a.get("prior").asDouble() - 2.49) < 1e-9)
    assert(a.get("suite_reps").size() == 3)
    assert(math.abs(a.get("adjudication_reps").get(1).asDouble() - 3.16) < 1e-2)
    val head = mapper.readTree(ls.last)
    assert(head.get("n_anomalies").asInt() == 1)
    assert(head.get("anomalies_top").get(0).asText() == "w_allreps")
    // absent anomalies -> empty object/zero count, keys always present
    val cleanLs = Bench.renderLines(rs, calibs, 2, "/sf")
    assert(mapper.readTree(cleanLs(6)).get("anomalies").size() == 0)
    assert(mapper.readTree(cleanLs.last).get("n_anomalies").asInt() == 0)
  }

  test("priorConverged reads BENCH_DETAIL-shaped files and refuses an sf " +
    "mismatch or a garbled file") {
    val f = java.io.File.createTempFile("bench_detail", ".json")
    f.deleteOnExit()
    val json = """{"round": 14, "headline": {"sf": "/root/testdata/sf0.1"},
      "per_query_converged": {"agg_spearman": 2.49, "q1_agg": 0.31}}"""
    java.nio.file.Files.write(f.toPath, json.getBytes)
    val m = Bench.priorConverged(f.getPath, "/root/testdata/sf0.1")
    assert(m == Map("agg_spearman" -> 2.49, "q1_agg" -> 0.31))
    assert(Bench.priorConverged(f.getPath, "target/sf1").isEmpty,
      "an sf1 probe must not adjudicate against sf0.1 priors")
    assert(Bench.priorConverged("/nonexistent/x.json", "/sf").isEmpty)
    val g = java.io.File.createTempFile("garbled", ".json")
    g.deleteOnExit()
    java.nio.file.Files.write(g.toPath, "{not json".getBytes)
    assert(Bench.priorConverged(g.getPath, "/sf").isEmpty)
  }

  test("multi-thread calibration spin returns a plausible worst-thread time") {
    // Not a steal assertion (CI noise) — just that the parallel spin runs,
    // returns positive seconds, and the worst thread >= a single-thread run
    // of the same kernel (it cannot be faster than the best case).
    val t = Bench.calibSpin(4)
    assert(t > 0.0 && t < 30.0)
  }
}
