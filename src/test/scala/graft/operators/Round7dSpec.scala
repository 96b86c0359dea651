package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 fourth wave: perceptual dHash over real decoded pixels,
  * silence-run detection over real decoded PCM, winsorized mean, and
  * cross-source vocabulary Jaccard. Decoder tests recompute expected
  * values ANALYTICALLY from the synthesis formulas (pure Scala mirrors
  * of the oracle arithmetic, not the decoder code under test). */
class Round7dSpec extends SparkSpec {

  import spark.implicits._

  // ---- dHash ----

  test("image dhash matches the analytic gradient bits from the " +
    "synthesis formula") {
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().filter(_ % 3 == 0).sorted
    def expected(docId: Long): (Int, Int, Long, Long) = {
      val w = (docId % 49 + 16).toInt
      val h = ((docId * 3) % 41 + 12).toInt
      val dd = (docId % 251).toInt
      def g(x: Int): Long =
        ((x * 7 + dd) % 256 + (x * 11 + 2 * dd) % 256 + (x * 13 + 3 * dd) % 256).toLong
      val bx = (0 to 9).map(i => i * w / 9)
      val by = (0 to 8).map(j => j * h / 8)
      val colSum = (0 until 9).map(i => (bx(i) until bx(i + 1)).map(g).sum)
      var lo = 0L; var hi = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        val rowH = (by(j + 1) - by(j)).toLong
        val csL = colSum(i) * rowH
        val csR = colSum(i + 1) * rowH
        val aL = (bx(i + 1) - bx(i)).toLong * rowH
        val aR = (bx(i + 2) - bx(i + 1)).toLong * rowH
        if (csL * aR > csR * aL) {
          val k = j * 8 + i
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      }
      (w, h, hi, lo)
    }
    val got = graft.multimodal.Multimodal.imageDhash(spark, sfDir)
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    assert(got == ids.map(d => {
      val (w, h, hi, lo) = expected(d); (d, w, h, hi, lo)
    }).toSeq)
    // gradient bits are non-degenerate: some set, some clear
    assert(got.exists(r => r._4 != 0L || r._5 != 0L))
    assert(got.exists(r => r._4 != -1L && r._5 != -1L))
  }

  // ---- audio silence ----

  test("audio silence runs match the analytic sample formula") {
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().filter(_ % 3 == 1).sorted
    def expected(docId: Long): (Long, Long, Long, Long, Long) = {
      val n = (docId % 601 + 200).toInt
      val rate = 8000 + (docId % 4) * 4000
      val base = ((docId % 997) * 7).toInt
      var quiet = 0L; var runs = 0L; var maxRun = 0L; var cur = 0L
      for (i <- 0 until n) {
        val s = (i * 31 + base) % 4096 - 2048
        if (math.abs(s) < 512) {
          quiet += 1; cur += 1
          if (cur == 1) runs += 1
          if (cur > maxRun) maxRun = cur
        } else cur = 0
      }
      (rate, n.toLong, quiet, runs, maxRun)
    }
    val got = graft.multimodal.Multimodal.audioSilence(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == ids.map(d => {
      val (r, n, q, ru, m) = expected(d); (d, r, n, q, ru, m)
    }).toSeq)
    // the quiet threshold actually bites: some clips have runs
    assert(got.exists(_._5 > 0))
  }

  // ---- winsorized mean ----

  test("winsorized mean matches a driver recompute of clamped sums") {
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(15,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    val expected = orders.groupBy(_._1).map { case (p, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length
      val k = n * 5 / 100
      val lo = sorted(k)
      val hi = sorted(n - k - 1)
      val sum = sorted.map(c => math.max(lo, math.min(hi, c))).sum
      (p, n.toLong, lo, hi, sum, Math.floorDiv(1000L * sum, n.toLong))
    }.toSeq.sortBy(_._1)
    val got = AdvancedAggs.winsorizedMean(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  // ---- vocab overlap ----

  test("vocab overlap matches a driver recompute of source-pair jaccard") {
    val st = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (s, t) => t.split("\\s+").filter(_.nonEmpty).map(s -> _) }
      .toSet
    val vocab = st.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val bySrc = st.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sources = vocab.keys.toSeq.sorted
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield {
      val common = (bySrc(a) & bySrc(b)).size.toLong
      (a, b, vocab(a), vocab(b), common,
        common * 1000000L / (vocab(a) + vocab(b) - common))
    }).filter(_._5 > 0).sortBy(t => (t._1, t._2))
    val got = TextAnalysis.vocabOverlap(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
