package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Invariant / differential tests for the round-6 sixth-session operators:
  * chi-square independence, log-free BM25 ranking, and SemDeDup-style
  * semantic embedding dedup. */
class Round6cSpec extends SparkSpec {

  test("chi2 cells: margins consistent, row deviations telescope to zero") {
    val rows = AdvancedAggs.chi2Independence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val n = rows.head._6
    assert(rows.forall(_._6 == n), "grand total constant across cells")
    // margins really are the row/column sums of the observed cells
    rows.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.map(_._3).sum == cs.head._4, "row margin = sum of row cells")
      // Σ_cells(o·n − r·c) over one row = r·n − r·Σc_present; with every
      // column present in the row it telescopes to exactly zero
      if (cs.length == rows.map(_._2).distinct.length)
        assert(cs.map(_._7).sum == 0L, "row deviations telescope to 0")
    }
    rows.groupBy(_._2).foreach { case (_, cs) =>
      assert(cs.map(_._3).sum == cs.head._5, "col margin = sum of col cells")
    }
    // chi2_micro is the exact floor-division of BigInt cross products
    rows.foreach { case (_, _, o, r, c, nn, dev, micro) =>
      assert(BigInt(dev) == BigInt(o) * nn - BigInt(r) * c)
      assert(BigInt(micro) ==
        BigInt(dev) * dev * 1000000 / (BigInt(nn) * r * c))
    }
  }

  test("bm25: driver-side recompute of the rational scoring at sf0.001") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val terms = Seq("filter", "join", "stream")
    val nDocs = docs.length.toLong
    val tl = docs.map(_._2.length.toLong).sum
    val tfs = for {
      (id, toks) <- docs
      t <- terms
      tf = toks.count(_ == t).toLong
      if tf > 0
    } yield (id, t, tf, toks.length.toLong)
    val dfm = tfs.groupBy(_._2).map { case (t, xs) => (t, xs.length.toLong) }
    val want = tfs.groupBy(_._1).map { case (id, xs) =>
      val score = xs.sortBy(_._2).foldLeft(0.0) { case (acc, (_, t, tf, dl)) =>
        val df = dfm(t)
        acc + (22L * tl * tf * (nDocs - df + 1)).toDouble /
          ((10L * tl * tf + 3L * tl + 9L * dl * nDocs) * (df + 1)).toDouble
      }
      (id, (xs.length.toLong, score))
    }
    val top = want.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.take(15)
    val got = TextAnalysis.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.length == 15)
    assert(got.toSeq == top.map { case (id, (nt, s)) => (id, nt, s) },
      "engine top-15 must equal the driver recompute bit-for-bit")
  }

  test("ks drift: statistic equals a driver-side exact recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type", "value",
        "ts < timestamp'2024-01-16 00:00:00' as in1").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val want = ev.groupBy(_._1).map { case (et, xs) =>
      val n1 = xs.count(_._3).toLong
      val n2 = xs.length - n1
      val vals = xs.map(_._2).distinct.sorted
      var c1 = 0L; var c2 = 0L
      val dnum = vals.map { v =>
        c1 += xs.count(x => x._2 == v && x._3)
        c2 += xs.count(x => x._2 == v && !x._3)
        (c1 * n2 - c2 * n1).abs
      }.max
      (et, (n1, n2, dnum))
    }
    val got = Events.driftKs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.map(r => (r._1, (r._2, r._3, r._4))).toMap == want)
    got.foreach { case (_, n1, n2, d, micro, drifted) =>
      assert(micro == d * 1000000L / (n1 * n2))
      assert(drifted ==
        (BigInt(1000000) * d * d > BigInt(1844164) * (n1 + n2) * n1 * n2))
    }
  }

  test("session overlap: bucketed join equals the quadratic verify") {
    val sess = Events.sessionize(spark, sfDir)
      .filter(col("n_events") >= 2)
      .selectExpr("user_id", "cast(session_start as long) st",
        "cast(session_end as long) en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      a <- sess; b <- sess
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield ((a._1, b._1),
      math.min(a._3, b._3) - math.max(a._2, b._2)))
      .groupBy(_._1).map { case (k, vs) =>
        (k, (vs.length.toLong, vs.map(_._2).sum))
      }
    val got = Events.sessionOverlap(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want, "bucketed emit-once join ≡ all-pairs interval join")
  }

  test("bootstrap ci: replicate machinery equals a driver-side replay") {
    import java.security.MessageDigest
    def h60(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
    }
    val thresholds = Seq(
      424136118829305329L, 848272237658610659L, 1060340297073263324L,
      1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
      1152825534095764625L)
    val ev = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type", "event_id",
        "cast(cast(value as decimal(15,2)) * 100 as long) cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // splitmix-style 60-bit mixer replay — hash md5 once per row, then
    // per replicate: XOR b*prime and two multiply-mod-2^60 rounds with
    // xor-shifts (Java long multiplication wraps mod 2^64, and 2^60
    // divides 2^64, so (v*C) & (2^60-1) IS v*C mod 2^60 — a third
    // formulation, independent of both the engine's 30/30-bit split and
    // the oracle's DECIMAL mod).
    val M60 = (1L << 60) - 1
    def mix(h: Long, b: Int): Long = {
      var v = h ^ (b.toLong * 4503599627370449L)
      v = (v * 6364136223846793005L) & M60
      v ^= v >>> 29
      v = (v * 2685821657736338717L) & M60
      v ^= v >>> 32
      v
    }
    val reps = for {
      (et, rows) <- ev.groupBy(_._1).toSeq
    } yield {
      val hashed = rows.map { case (_, id, cents) => (h60(s"boot:$id"), cents) }
      val ms = (0 until 100).map { b =>
        var swc = 0L; var sw = 0L
        hashed.foreach { case (h, cents) =>
          val u = mix(h, b)
          val w = thresholds.count(_ <= u).toLong
          swc += w * cents; sw += w
        }
        swc.toDouble / sw.toDouble
      }.sorted
      (et, (rows.length.toLong,
        rows.map(_._3).sum.toDouble / rows.length,
        ms(2), ms(97)))
    }
    val got = AdvancedAggs.bootstrapCi(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == reps.toMap,
      "engine bootstrap CI must equal the driver replay bit-for-bit")
    // the interval is sane: nonempty and straddles the point estimate
    got.values.foreach { case (_, m, lo, hi) =>
      assert(lo <= hi && lo <= m && m <= hi)
    }
  }

  test("centroid confusion equals the assignment cross-tab") {
    val asg = Similarity.ivfKmeans(spark, sfDir).collect()
      .map(r => (r.getInt(2), r.getInt(1)))
    val want = asg.groupBy(identity).map { case ((cid, l), xs) =>
      ((cid, l), xs.length.toLong)
    }
    val got = Similarity.centroidConfusion(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
    assert(got.map(x => (x._1, x._2._1)).toMap == want)
    got.groupBy(_._1._1).foreach { case (cid, cells) =>
      assert(cells.map(_._2._1).sum == cells.head._2._2,
        s"cid $cid margin = sum of its cells")
    }
    assert(got.map(_._2._1).sum == asg.length.toLong)
  }

  test("dsir ratios equal a driver-side recompute of the hashed-domain stats") {
    import java.security.MessageDigest
    def h60(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
    }
    val toks = graft.core.Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(t => (r.getString(0) == "en", (h60(t) % 16).toInt)))
    val cnt = toks.groupBy(_._2).map { case (dim, xs) =>
      (dim, (xs.count(_._1).toLong, xs.count(!_._1).toLong))
    }
    val nT = cnt.values.map(_._1).sum
    val nS = cnt.values.map(_._2).sum
    val got = TrainingPipeline.dsirRatios(spark, sfDir).collect()
      .map(r => (r.getLong(0).toInt, (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == cnt.keySet)
    got.foreach { case (dim, (ct, cs, gt, gs, micro)) =>
      assert((ct, cs) == cnt(dim))
      assert(gt == nT && gs == nS)
      assert(BigInt(micro) ==
        (BigInt(ct) + 1) * (nS + 16) * 1000000 / ((BigInt(cs) + 1) * (nT + 16)))
    }
  }

  test("decay popularity equals a driver-side dyadic recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type",
        "datediff(to_date('2024-02-01'), to_date(ts)) div 7 as w").collect()
      .map(r => (r.getString(0), math.min(5, math.max(0, r.getLong(1))).toInt))
    val want = ev.groupBy(_._1).map { case (et, xs) =>
      (et, (xs.length.toLong,
        xs.map(x => 1L << (5 - x._2)).sum))
    }
    val got = Events.decayPopularity(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == want)
    got.values.foreach { case (n, x32, d) =>
      assert(x32 <= 32L * n && x32 >= n, "weights live in [1/32, 1]")
      assert(d == x32.toDouble / 32.0)
    }
  }

  test("constraint audit reports every check and the corpus is clean") {
    val got = Diagnostics.constraintAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet == Set(
      "orders_pk_unique", "customer_pk_unique", "orders_fk_customer",
      "lineitem_fk_orders", "lineitem_qty_range", "events_value_positive",
      "documents_nchars_consistent"))
    got.foreach { case (name, v, ok) =>
      assert(ok == (v == 0L), s"$name flag consistent")
      assert(v == 0L, s"driver testdata violates $name")
    }
  }

  test("semantic dedup: decisions equal a driver-side within-cluster verify") {
    val asg = Similarity.ivfKmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toMap
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val ids = emb.keys.toSeq.sorted
    val pairs = for {
      x <- ids; y <- ids
      if x != y && asg(x) == asg(y) && cos(emb(x), emb(y)) >= 0.3
    } yield (x, y)
    val nd = pairs.groupBy(_._1).map { case (v, ps) =>
      (v, (ps.length.toLong, ps.forall(_._2 > v)))
    }
    val got = Similarity.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == emb.keySet, "one decision row per vector")
    got.foreach { case (v, (cid, dups, keep)) =>
      assert(cid == asg(v))
      val (wantDups, wantKeep) = nd.getOrElse(v, (0L, true))
      assert(dups == wantDups, s"vec $v n_dups")
      assert(keep == wantKeep, s"vec $v keep")
    }
    // at least the decision table is non-degenerate on this corpus: the
    // gate corpus is near-orthogonal, so most vectors must be kept
    assert(got.values.count(_._3) >= got.size / 2)
  }
}
