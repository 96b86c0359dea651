package graft.multimodal

import graft.SparkSpec

class AudioFpSpec extends SparkSpec {

  /** Independent analytic recompute of one clip's fingerprint from the
    * synth closed form (no decode, no SQL). */
  private def analyticFp(docId: Long): (Long, Long, Long) = {
    val n = (docId % 601 + 200).toInt
    val base = ((docId % 997) * 7).toInt
    val nw = n / 32
    val e = Array.tabulate(nw) { w =>
      (w * 32 until w * 32 + 32).map { i =>
        val s = (i * 31 + base) % 4096 - 2048
        s.toLong * s
      }.sum
    }
    var fp = 0L
    for (w <- 0 until nw - 1) fp = (fp << 1) | (if (e(w + 1) > e(w)) 1L else 0L)
    (nw.toLong, (nw - 1).toLong, fp)
  }

  test("decoded fingerprints equal the analytic closed form for every clip") {
    val rows = Multimodal.audioFingerprint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, bits, fp) = analyticFp(r.getLong(0))
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((nw, bits, fp)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("every qualifying excerpt retrieves its own source at its offset " +
    "(the guaranteed self-hit of the landmark-index lookup)") {
    val dir = "/root/testdata/sf0.01"
    val rows = Multimodal.audioFpLookup(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(0)))
    assert(rows.nonEmpty)
    val fps = Multimodal.audioFingerprint(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap // doc -> n_windows
    val selfHits = rows.collect {
      case (epos, mdoc, mpos, _, qdoc) if qdoc == mdoc && mpos == epos => qdoc
    }.toSet
    val expected = fps.collect {
      case (doc, nw) if nw >= doc % 4 + Multimodal.FpLandmarkWindows => doc
    }.toSet
    assert(expected.nonEmpty && selfHits == expected)
    // landmarks are 60-bit portable hashes
    rows.foreach { case (_, _, _, landmark, _) =>
      assert(landmark >= 0 && landmark < (1L << 60))
    }
    // value-based landmarks must not collapse: distinct landmark count is
    // ~excerpt count (the delta-sign formulation degenerated to 30 keys)
    val distinctLandmarks = rows.map(_._4).distinct.length
    assert(distinctLandmarks > expected.size / 2,
      s"landmark entropy collapsed: $distinctLandmarks keys for " +
        s"${expected.size} excerpts")
  }
}
