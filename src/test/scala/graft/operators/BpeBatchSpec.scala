package graft.operators

import graft.SparkSpec

/** Differential proof that the batched BPE merge selection is exactly the
  * sequential greedy loop, only with fewer driver round-trips: running
  * [[Bpe.trainBatched]] with maxAccept = 1 IS the classic
  * one-merge-per-job loop (each round collects the argmax and applies a
  * single rule), so merge-table equality against the default batched run
  * pins the selection invariant — including the round-9 count-gap +
  * tie-aware hazard — on the real corpus vocab. All distributed-path
  * tests pass `driverLimit = 0` to force the batched loop (the default
  * routes this tiny vocab to the driver-finishing path, which the last
  * test proves equal). */
class BpeBatchSpec extends SparkSpec {

  test("batched merge selection = sequential greedy, with fewer rounds") {
    val (seqMerges, _, seqRounds) = Bpe.trainBatched(spark, sfDir, 1, driverLimit = 0)
    val (batMerges, _, batRounds) =
      Bpe.trainBatched(spark, sfDir, Int.MaxValue, driverLimit = 0)
    assert(batMerges == seqMerges,
      "batched selection must produce the identical merge sequence " +
        "(step, l, r, merged, pair_count) as one-merge-per-round greedy")
    // one round per merge, plus one final empty-candidate round that
    // discovers exhaustion (Steps=128 exceeds this corpus's 89 merges)
    assert(seqRounds == seqMerges.length + 1,
      "sequential mode pays one distributed round per merge + exhaustion probe")
    assert(batRounds < seqRounds,
      s"batching must cut rounds (got $batRounds vs sequential $seqRounds)")
    // the tiny sf0.001 vocab is tie/conflict-dense, so batches are small;
    // still expect a >= 25% round cut here (sf0.01 measures ~2x+)
    assert(batRounds * 4 <= seqRounds * 3,
      s"expect at least a 25% round reduction on this corpus ($batRounds)")
  }

  test("delta-maintained pair counts equal a full recount every round") {
    val (_, _, _, probes) =
      Bpe.trainBatchedImpl(spark, sfDir, Int.MaxValue, instrument = true,
        driverLimit = 0)
    assert(probes.nonEmpty)
    probes.zipWithIndex.foreach { case (p, i) =>
      // Independent full recount on the driver from the round's vocab
      // snapshot — pure Scala, never the Spark delta path being tested.
      val full = scala.collection.mutable.HashMap[(String, String), Long]()
      p.vocab.foreach { case (_, cnt, syms) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => full((a, b)) = full.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      val standing = p.counts.map { case (l, r, c) => (l, r) -> c }.toMap
      assert(standing == full.toMap,
        s"round ${i + 1}: delta-maintained counts diverge from full recount")
    }
  }

  test("delta maintenance cuts aggregated pair rows at least 4x") {
    val (_, _, _, probes) =
      Bpe.trainBatchedImpl(spark, sfDir, Int.MaxValue, instrument = true,
        driverLimit = 0)
    val deltaRows = probes.map(_.deltaPairRows).sum
    val fullRows = probes.map(_.fullPairRows).sum
    assert(deltaRows > 0)
    assert(fullRows >= 4 * deltaRows,
      s"expected >=4x fewer aggregated rows than per-round full recounts " +
        s"(delta $deltaRows vs full $fullRows)")
    // per-round cost drops with convergence: the late-training delta is
    // smaller than the early-training delta
    val early = probes.take(probes.length / 2).map(_.deltaPairRows).sum
    val late = probes.drop(probes.length / 2).map(_.deltaPairRows).sum
    assert(late < early,
      s"per-round delta cost should shrink as the vocab converges ($early -> $late)")
  }

  test("final vocab identical between batched and sequential application") {
    val (_, seqVocab, _) = Bpe.trainBatched(spark, sfDir, 1, driverLimit = 0)
    val (_, batVocab, _) =
      Bpe.trainBatched(spark, sfDir, Int.MaxValue, driverLimit = 0)
    val a = seqVocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val b = batVocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(a == b, "per-word symbol arrays must match exactly")
  }

  test("(r,l)-tie corner: reversed candidate registers ALL its new-pair keys") {
    // Accepting (x,z) -> m="xz" makes the REVERSED candidate (z,x) a
    // generator of THREE possible new-pair keys: (z,xz) when only its
    // right x merges, (xz,x) when only its left z merges, (xz,xz) when
    // both do. A tie-break enumeration that keeps only the first-branch
    // key (z,xz) would accept the count-tied candidate (y,w) — because
    // (z,xz) sorts after (y,w) — even though the unregistered key (xz,x)
    // sorts BEFORE it and could win sequential greedy's (count,l,r)
    // tie-break. The safe answer is to stop the batch after (x,z).
    val cands = Array(("x", "z", 10L), ("y", "w", 5L), ("z", "x", 5L))
    val known = scala.collection.mutable.Set("x", "z", "y", "w")
    val acc = Bpe.selectBatch(cands, truncated = false,
      maxAccept = Int.MaxValue, joiner = "", knownSymbols = known)
    assert(acc == Seq(("x", "z", 10L)),
      s"tie against an unregistered (m,*) key must stop the batch, got $acc")
    // Control: with the tied candidate sorting after EVERY generated key
    // ((z,xz) < (zz,*) keys... use l_i > all of m,l2), acceptance is safe
    // and must still happen — the fix must not over-reject clean ties.
    val cands2 = Array(("a", "b", 10L), ("c", "d", 5L))
    val known2 = scala.collection.mutable.Set("a", "b", "c", "d")
    val acc2 = Bpe.selectBatch(cands2, truncated = false,
      maxAccept = Int.MaxValue, joiner = "", knownSymbols = known2)
    assert(acc2 == Seq(("a", "b", 10L), ("c", "d", 5L)),
      s"disjoint non-generator candidates above the hazard must batch, got $acc2")
  }

  test("driver-finishing path equals the distributed loop exactly") {
    // The production route for any vocab under DriverVocabLimit: one
    // collect, exact in-memory greedy. Must reproduce the distributed
    // batched loop's merge table AND final per-word symbol arrays.
    val (distMerges, distVocab, _) =
      Bpe.trainBatched(spark, sfDir, Int.MaxValue, driverLimit = 0)
    val (drvMerges, drvVocab, drvRounds) =
      Bpe.trainBatched(spark, sfDir, Int.MaxValue, driverLimit = Bpe.DriverVocabLimit)
    assert(drvRounds == 1, "driver path pays a single distributed round (the collect)")
    assert(drvMerges == distMerges, "merge tables must be identical")
    val a = distVocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val b = drvVocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(a == b, "final vocabs must be identical")
  }

  test("interned Int fold == string applyRule fold on adversarial sequences") {
    // The corpus encode runs applyRuleInterned under a presence-count
    // guard; the guarded Int fold must equal the plain string fold on
    // every sequence, including self-pair rules (l == r), chained merges,
    // rules whose output feeds a LATER rule, and unknown symbols.
    val rnd = new scala.util.Random(0xB9E)
    val words = Array("a", "b", "c", "d", "u1", "u2") // u* stay un-ruled
    for (trial <- 0 until 300) {
      val seq = Array.fill(rnd.nextInt(24))(words(rnd.nextInt(words.length)))
      // random rule list over phrases of the known alphabet, merge-order
      // realistic: each rule's output may appear in later rules' inputs
      var pool = Array("a", "b", "c", "d")
      val rules = (0 until 12).map { _ =>
        val l = pool(rnd.nextInt(pool.length))
        val r = pool(rnd.nextInt(pool.length))
        val m = l + " " + r
        pool = pool :+ m
        (l, r, m)
      }
      // string fold
      var curS = seq
      rules.foreach { case (l, r, m) => curS = Bpe.applyRule(curS, l, r, m) }
      // interned fold with guard
      val symId = rules.flatMap(t => Seq(t._1, t._2, t._3)).distinct
        .zipWithIndex.toMap
      val present = new Array[Int](symId.size)
      var curI = seq.map(s => symId.getOrElse(s, -1))
      curI.foreach(id => if (id >= 0) present(id) += 1)
      rules.foreach { case (l, r, m) =>
        val (li, ri, mi) = (symId(l), symId(r), symId(m))
        if (present(li) > 0 && present(ri) > 0)
          curI = Bpe.applyRuleInterned(curI, li, ri, mi, present)
      }
      assert(curI.length == curS.length,
        s"trial $trial: interned ${curI.length} != string ${curS.length} " +
          s"on ${seq.mkString(",")} rules ${rules.mkString(";")}")
      // the guard's presence counts must stay exact, not just non-negative
      val truth = curS.groupBy(identity).view.mapValues(_.length).toMap
      symId.foreach { case (s, id) =>
        assert(present(id) == truth.getOrElse(s, 0),
          s"trial $trial: presence[$s] = ${present(id)} " +
            s"!= ${truth.getOrElse(s, 0)}")
      }
    }
  }
}
