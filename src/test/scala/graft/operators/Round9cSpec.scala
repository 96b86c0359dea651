package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant / differential tests for the round-9 third-wave operators:
  * unigram Viterbi segmentation, synchronous label propagation, the AMS
  * F₂ sketch, and the Zipf activity fit. */
class Round9cSpec extends SparkSpec {

  /** Driver-side replica of portable_hash60 (first 15 md5 hex digits). */
  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
  }

  // ---- Unigram Viterbi (pure DP semantics) ----

  test("viterbi picks the min-total-cost segmentation") {
    // costs are quantized NEGATIVE log-probs: cheaper = more probable
    val sc = Map("a" -> 10L, "b" -> 10L, "ab" -> 1L)
    val r = Unigram.viterbi("abab", sc)
    assert(r.seg == "ab ab" && r.n_pieces == 2 && r.total_cost == 2L)
  }

  test("viterbi tie on total cost prefers the longer final piece") {
    // "ab" as one piece costs 5; "a"+"b" also costs 5 — longer k wins
    val sc = Map("a" -> 2L, "b" -> 3L, "ab" -> 5L)
    val r = Unigram.viterbi("ab", sc)
    assert(r.seg == "ab" && r.n_pieces == 1 && r.total_cost == 5L)
  }

  test("viterbi falls back to single chars when no multi-piece applies") {
    val sc = Map("x" -> 2L, "y" -> 2L, "z" -> 2L)
    val r = Unigram.viterbi("xyz", sc)
    assert(r.seg == "x y z" && r.n_pieces == 3 && r.total_cost == 6L)
  }

  test("viterbi crosses a cheap piece boundary when it pays") {
    // "bc" is near-free, so "abcd" should split a | bc | d (cost 3), not
    // ab | cd (6) or singles (4)
    val sc = Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 3L, "cd" -> 3L, "bc" -> 1L)
    val r = Unigram.viterbi("abcd", sc)
    assert(r.seg == "a bc d" && r.total_cost == 3L)
  }

  // ---- Label propagation (synthetic two-community graph) ----

  test("LPA resolves two triangles joined by a bridge into two communities") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("u1", "u2")
    val sym = und.union(und.select(col("u2").as("u1"), col("u1").as("u2")))
    val got = Graph.lpaLabels(sym, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  // ---- AMS F2 sketch vs a driver-side recompute at sf0.001 ----

  test("AMS estimator counters match a driver-side recompute") {
    val freqs = graft.core.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val wantZ = (0 until 16).map { j =>
      j.toLong -> freqs.map { case (u, f) =>
        ((h60(s"ams$j:$u") % 2) * 2 - 1) * f
      }.sum
    }.toMap
    val wantF2 = freqs.map { case (_, f) => f * f }.sum
    val rows = AdvancedAggs.amsF2(spark, sfDir).collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      assert(r.getLong(1) == wantZ(r.getLong(0)), s"z mismatch at ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(1) * r.getLong(1))
      assert(r.getLong(3) == wantF2)
    }
    val meanEst = wantZ.values.map(z => z * z).sum / 16
    assert(rows.head.getLong(4) == meanEst)
  }

  // ---- UniMax water-filling invariants at sf0.001 ----

  test("UniMax allocations respect cap, share and budget") {
    val rows = TrainingPipeline.unimax(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val total = rows.map(_._1).sum
    val budget = 9L * total / 10
    rows.foreach { case (_, cap, share, alloc, capped) =>
      assert(alloc == math.min(cap, share))
      assert(capped == (if (alloc == cap) 1L else 0L))
    }
    assert(rows.map(_._4).sum <= budget)
    // the gate corpus must exercise BOTH regimes
    assert(rows.exists(_._5 == 1L) && rows.exists(_._5 == 0L))
  }

  // ---- Kneser-Ney vs a driver-side recompute at sf0.001 ----

  test("Kneser-Ney doc scores match a driver-side recompute") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val bigrams = docs.flatMap { case (id, ws) =>
      ws.sliding(2).collect { case Array(a, b) => (id, a, b) }
    }
    val c12 = bigrams.groupBy(t => (t._2, t._3)).map { case (k, g) => k -> g.length.toLong }
    val c1 = c12.toSeq.groupBy(_._1._1).map { case (l, g) => l -> g.map(_._2).sum }
    val t1 = c12.toSeq.groupBy(_._1._1).map { case (l, g) => l -> g.length.toLong }
    val cont2 = c12.toSeq.groupBy(_._1._2).map { case (r, g) => r -> g.length.toLong }
    val nbt = c12.size.toLong
    def bits(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x * x)
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, l, r) =>
        val num = (4 * c12((l, r)) - 3) * nbt + 3 * t1(l) * cont2(r)
        val den = 4 * c1(l) * nbt
        bits(den / num)
      }.sum
      id -> (bs.length.toLong, s, 1000 * s / bs.length)
    }
    val got = TextAnalysis.kneserNey(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, s, avg) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == avg,
        s"doc ${r.getLong(0)}")
    }
  }

  // ---- Personalized PageRank invariants at sf0.001 ----

  test("PPR output is positive, descending, and seeded mass stays local") {
    val rows = Graph.pprInt(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_._2 > 0L))
    assert(rows.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    })
  }

  // ---- Matryoshka funnel invariants at sf0.001 ----

  test("Matryoshka re-rank recall dominates prefix-only recall") {
    val r = Similarity.matryoshkaRecall(spark, sfDir).collect().head
    val (n, hp, hr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0)
    // the re-rank can only swap shortlist members toward exact order:
    // anything the prefix top-3 got right stays available to the re-rank
    assert(hr >= hp, s"rerank hits $hr < prefix hits $hp")
    assert(hp <= 3 * n && hr <= 3 * n)
    assert(r.getDouble(3) == hp.toDouble / (n * 3))
    assert(r.getDouble(4) == hr.toDouble / (n * 3))
  }

  // ---- Zipf activity fit vs a driver-side recompute at sf0.001 ----

  test("Zipf activity moments and slope match a driver-side recompute") {
    def qlog(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x * x)
    val freqs = graft.core.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("f")).collect()
      .map(_.getLong(1))
    val tiers = freqs.groupBy(identity).map { case (f, g) => (f, g.length.toLong) }
    // .toSeq BEFORE mapping: quantized (x, y) points collide, and mapping
    // a Map would silently merge them (the Map.map trap)
    val pts = tiers.toSeq.map { case (f, _) =>
      val rank = 1L + tiers.collect { case (f2, n2) if f2 > f => n2 }.sum
      (qlog(rank), qlog(f))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    val r = Events.zipfActivity(spark, sfDir).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sx && r.getLong(2) == sy)
    assert(r.getLong(3) == sxx && r.getLong(4) == sxy)
    assert(r.getDouble(5) == slope)
    assert(slope < 0.0, "activity rank-frequency should be decreasing")
  }
}
