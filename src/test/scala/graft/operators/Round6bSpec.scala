package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant / differential tests for the round-6 fourth-session
  * operators: hashed features + linear classifier, weighted priority
  * sampling, context-window chunking, MinHash calibration, forecast
  * backtest, and local clustering coefficients. */
class Round6bSpec extends SparkSpec {

  /** Driver-side replica of portable_hash60 (first 15 md5 hex digits). */
  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
  }

  test("feature hashing matches a driver-side recompute at sf0.001") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = Features.featureHashing(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val want = docs.toSeq.flatMap { case (id, text) =>
      text.split("\\s+").filter(_.nonEmpty).map { t =>
        val h = h60(t)
        ((id, (h % 16).toInt), if ((h / 16) % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    assert(got == want)
  }

  test("classifier score is the fixed linear model over the features") {
    val feats = Features.featureHashing(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = feats.groupBy(_._1).map { case (id, rows) =>
      (id, 3L + rows.map { case (_, d, w) => w * ((d * 37) % 21 - 10) }.sum)
    }
    val got = Features.classifierScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.map(r => (r._1, r._2)).toMap == want)
    assert(got.forall { case (_, s, l) => (s > 0) == (l == "keep") })
  }

  test("weighted sample: k rows, deterministic, priority formula exact") {
    val s1 = TrainingPipeline.weightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s2 = TrainingPipeline.weightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq == s2.toSeq, "sample must be bit-reproducible")
    assert(s1.length == 50)
    s1.foreach { case (id, w, p) =>
      val r30 = h60(s"ws:$id") % 1073741824L
      assert(p == r30 * 1000000L / math.max(w, 1L))
    }
    // the 50 kept priorities are the global minimum set
    val all = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map { r =>
        val (id, w) = (r.getLong(0), r.getLong(1))
        (h60(s"ws:$id") % 1073741824L * 1000000L / math.max(w, 1L), id)
      }.sorted.take(50)
    assert(s1.map(t => (t._3, t._1)).sorted.toSeq == all.toSeq)
  }

  test("chunk windows tile each document exactly") {
    val w = TrainingPipeline.ChunkWindow
    val s = TrainingPipeline.ChunkStride
    val chunks = TrainingPipeline.chunkWindows(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nToks = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(chunks.keySet == nToks.keySet)
    var sawMulti = false
    chunks.foreach { case (id, cs) =>
      val n = nToks(id)
      val sorted = cs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, ci, start, len), i) =>
        assert(ci == i && start == i.toLong * s)
        assert(len >= 1 && len <= w)
        if (i < sorted.length - 1) assert(len == w, "only the last chunk may be short")
      }
      val last = sorted.last
      assert(last._3 + last._4 == n, "last chunk must end at the doc's end")
      if (cs.length > 1) sawMulti = true
    }
    assert(sawMulti, "corpus must exercise the multi-chunk path")
  }

  test("minhash calibration bins are consistent and mass-conserving") {
    val dir = "/root/testdata/sf0.01" // sf0.001 has too few candidate pairs
    val rows = Dedup.minhashCalibration(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (bin, n, sm, sc, su, meanEst, pooled) =>
      assert(bin >= 0 && bin <= 10)
      assert(n > 0 && sm >= 0 && sc > 0 && su >= sc)
      assert(meanEst == sm.toDouble / (n * 16))
      assert(pooled == sc.toDouble / su)
      assert(meanEst >= bin / 10.0 - 1e-9 && meanEst <= (bin + 1) / 10.0 + 1e-9,
        "mean estimate must lie inside its own bin")
    }
    // every verified LSH pair (jaccard >= 0.8) is also a calibration pair,
    // so calibration pair mass is at least the LSH output size
    val lshPairs = Dedup.minhashLsh(spark, dir).count()
    assert(rows.map(_._2).sum >= lshPairs)
  }

  test("forecast backtest WAPE matches a driver recompute") {
    val dir = "/root/testdata/sf0.01"
    val daily = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("d"))
      .agg(sum((col("value").cast("decimal(15,2)") * 100).cast("long")).as("c"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .toMap
    val want = daily.toSeq.flatMap { case ((t, d), c) =>
      daily.get((t, d.minusDays(7))).map(p => (t, math.abs(c - p), c))
    }.groupBy(_._1).map { case (t, vs) =>
      (t, (vs.length.toLong, vs.map(_._2).sum, vs.map(_._3).sum))
    }
    val got = Behavioral.forecastBacktest(spark, dir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
    assert(got.map(r => (r._1, (r._2._1, r._2._2, r._2._3))).toMap == want)
    got.foreach { case (_, (_, err, act, wape)) =>
      assert(wape == err.toDouble / act && wape >= 0)
    }
  }

  test("local clustering credits each triangle three times, lcc in [0,1]") {
    val dir = "/root/testdata/sf0.01"
    val nTri = Graph.triangleCount(spark, dir).collect().head.getLong(2)
    val rows = Graph.localClustering(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._3).sum == 3 * nTri)
    rows.foreach { case (_, deg, tri, wedges, lcc) =>
      assert(deg >= 2 && wedges == deg * (deg - 1) / 2)
      assert(tri <= wedges && lcc == tri.toDouble / wedges)
      assert(lcc >= 0.0 && lcc <= 1.0)
    }
  }
}
