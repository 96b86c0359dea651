package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 third wave: Spearman/Kendall/Cramér's-V association stats,
  * the log-binned word frequency spectrum, length-bucketed batching,
  * deterministic epoch shuffle, cosine range search, and funnel stage
  * timing. Each test recomputes the operator's result independently on
  * the driver (pure Scala over the raw tables), never by re-running the
  * same Spark plan. */
class Round7cSpec extends SparkSpec {

  import spark.implicits._

  // ---- Spearman ----

  test("spearman matches a driver recompute with average ranks") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[(String, Double, Double)].collect()
    def ranks2(vs: Seq[Double]): Map[Double, Long] = {
      val sorted = vs.sorted
      // doubled average rank per distinct value: lo+hi of its tie block
      sorted.zipWithIndex.groupBy(_._1).map { case (v, ps) =>
        v -> (ps.map(_._2 + 1L).min + ps.map(_._2 + 1L).max)
      }
    }
    val expected = li.groupBy(_._1).map { case (flag, rows) =>
      val rx = ranks2(rows.map(_._2).toSeq)
      val ry = ranks2(rows.map(_._3).toSeq)
      val n = BigInt(rows.length)
      val xs = rows.map(r => BigInt(rx(r._2)))
      val ys = rows.map(r => BigInt(ry(r._3)))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = rows.map(r => BigInt(rx(r._2)) * BigInt(ry(r._3))).sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      val num = (n * sxy - sx * sy).toDouble
      val dx = math.sqrt((n * sxx - sx * sx).toDouble)
      val dy = math.sqrt((n * syy - sy * sy).toDouble)
      flag -> (rows.length.toLong,
        math.floor(1000000.0 * num / (dx * dy) + 0.5).toLong)
    }
    val got = AdvancedAggs.spearmanRank(spark, sfDir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected)
    // sanity: price and quantity are independent in this generator, so
    // |rho| must be small but the statistic must be nondegenerate
    assert(got.values.forall { case (_, rho) => math.abs(rho) < 300000 })
  }

  // ---- Kendall tau-b ----

  test("kendall tau-b matches a driver recompute over monthly volumes") {
    val monthly = graft.core.Tables.orders(spark, sfDir)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val pairs = for {
      i <- monthly.indices; j <- (i + 1) until monthly.length
    } yield (monthly(i)._2, monthly(j)._2)
    val conc = pairs.count { case (a, b) => b > a }.toLong
    val disc = pairs.count { case (a, b) => b < a }.toLong
    val ties = pairs.count { case (a, b) => b == a }.toLong
    val np = pairs.length.toLong
    val tau = math.floor(1000000.0 * (conc - disc) /
      (math.sqrt(np.toDouble) * math.sqrt((np - ties).toDouble)) + 0.5).toLong
    val got = AdvancedAggs.kendallTau(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((monthly.length.toLong, np, conc, disc, ties, tau)))
  }

  // ---- Cramér's V ----

  test("cramers v matches a driver recompute from the contingency table") {
    val cells = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), ((dayofweek(col("ts")) + 5) % 7 + 1).as("d"))
      .agg(count(lit(1)).as("o"))
      .as[(String, Int, Long)].collect()
    val n = cells.map(_._3).sum
    val rm = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cm = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chiMicro = cells.map { case (t, d, o) =>
      val dev = BigInt(o) * n - BigInt(rm(t)) * cm(d)
      (dev * dev * 1000000 / (BigInt(n) * rm(t) * cm(d))).toLong
    }.sum
    val k = math.min(rm.size, cm.size) - 1
    val v = math.floor(1000000.0 * math.sqrt(
      chiMicro.toDouble / (1000000.0 * n.toDouble * k)) + 0.5).toLong
    val got = AdvancedAggs.cramersV(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((n, rm.size.toLong, cm.size.toLong, chiMicro, v)))
  }

  // ---- frequency spectrum ----

  test("freq spectrum matches a driver recompute of log-binned counts") {
    val toks = graft.core.Tables.documents(spark, sfDir)
      .select("text").as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
    val cnts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = cnts.size.toLong
    val singles = cnts.values.count(_ == 1L).toLong
    def band(f: Long): Long = java.lang.Long.highestOneBit(f)
    val expected = cnts.values.groupBy(band).map { case (b, fs) =>
      (b, fs.size.toLong, fs.sum, vocab, singles)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.freqSpectrum(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  // ---- length buckets ----

  test("length buckets match a driver recompute of power-of-two caps") {
    val lens = graft.core.Tables.documents(spark, sfDir)
      .select("text").as[String].collect()
      .map(_.split("\\s+", -1).length.toLong)
    def cap(n: Long): Long =
      Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
        .find(n <= _).getOrElse(4096L)
    val expected = lens.groupBy(cap).map { case (b, ns) =>
      val (nd, st) = (ns.length.toLong, ns.sum)
      (b, nd, st, b * nd, (b * nd - st) * 1000000L / (b * nd))
    }.toSeq.sortBy(_._1)
    val got = TrainingPipeline.lengthBuckets(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  // ---- epoch shuffle ----

  test("epoch shuffle positions match a driver recompute and differ " +
    "between epochs") {
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect()
    def h(e: Int, id: Long): Long =
      graft.functions.HashUtil.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"ep:$e:$id"))
    val expected = (for {
      e <- Seq(0, 1); p <- ids if p < 100
    } yield {
      val hp = h(e, p)
      val below = ids.count(d => h(e, d) < hp || (h(e, d) == hp && d < p))
      (e, p, below + 1L)
    }).sortBy(t => (t._1, t._2))
    val got = TrainingPipeline.epochShuffle(spark, sfDir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == expected)
    // the two epochs are genuinely different permutations
    val e0 = got.filter(_._1 == 0).map(t => t._2 -> t._3).toMap
    val e1 = got.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    assert(e0 != e1)
    // positions within an epoch are distinct (it IS a permutation slice)
    assert(e0.values.toSeq.distinct.size == e0.size)
  }

  // ---- range search ----

  test("range search matches a driver recompute of threshold neighbors") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = emb.filter(_._1 < 500).flatMap { case (q, qv) =>
      val hits = emb.filter(_._1 != q)
        .map { case (v, ev) => (v, cos(qv, ev)) }
        .filter(_._2 >= 0.2)
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (v, c) => (-c, v) }
        Some((q, hits.length.toLong, best._1, best._2))
      }
    }.toSeq.sortBy(_._1)
    val got = Similarity.rangeSearch(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  // ---- funnel timing ----

  test("funnel timing matches a driver recompute of stage gaps") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val gaps = byUser.toSeq.flatMap { case (_, rows) =>
      val s = rows.filter(_._2 == "signup").map(_._3).sorted.headOption
      s.flatMap { sTs =>
        val c = rows.filter(r => r._2 == "click" && r._3 >= sTs)
          .map(_._3).sorted.headOption
        c.flatMap { cTs =>
          rows.filter(r => r._2 == "purchase" && r._3 >= cTs)
            .map(_._3).sorted.headOption
            .map(pTs => (cTs - sTs, pTs - cTs))
        }
      }
    }
    def medLoHi(vs: Seq[Long]): (Long, Long) = {
      val s = vs.sorted
      (s((vs.length - 1) / 2), s(vs.length / 2))
    }
    def row(stage: String, vs: Seq[Long]) = {
      val (lo, hi) = medLoHi(vs)
      (stage, vs.length.toLong,
        Math.floorDiv(1000L * vs.sum, vs.length.toLong), lo, hi)
    }
    val expected = Seq(
      row("click_to_purchase", gaps.map(_._2)),
      row("signup_to_click", gaps.map(_._1)))
    val got = Behavioral.funnelTiming(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
