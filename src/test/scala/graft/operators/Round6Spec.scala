package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant/differential guards for the round-6 composite operators. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private def docsMap: Map[Long, String] =
    graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("substring clusters equal union-find over the winnowed pair graph") {
    val pairs = SubstringDedup.substringWinnow(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = docsMap.keySet
    val expected = ids.map(id => id -> find(id)).toMap
    // canonical label = min member of each component
    val minLabel = expected.groupBy(_._2).map { case (root, m) =>
      root -> m.keys.min
    }
    val want = expected.view.mapValues(minLabel).toMap
    val got = SubstringDedup.substringClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // cluster_size consistency
    val sizes = SubstringDedup.substringClusters(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val bySize = sizes.groupBy(_._1)
    bySize.foreach { case (cid, rows) =>
      assert(rows.forall(_._2 == rows.length), s"cluster $cid size")
    }
  }

  test("leakage-safe split: near-dup pairs never straddle splits; all docs covered") {
    val split = TrainingPipeline.leakageSafeSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.keySet == docsMap.keySet, "one row per document")
    assert(split.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // every Jaccard >= 0.8 pair shares a cluster AND a split
    val pairs = Dedup.ngramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) cluster")
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) LEAKED across splits")
    }
    // split is the documented pure function of cluster_id
    split.foreach { case (_, (cid, s)) =>
      val h = graft.functions.HashUtil.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"split:$cid")) % 100
      val want = if (h < 90) "train" else if (h < 95) "val" else "test"
      assert(s == want, s"cluster $cid split function")
    }
  }

  test("trigram coverage equals a brute-force document-frequency recompute") {
    def shingles(t: String): Set[String] =
      t.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = docsMap.view.mapValues(shingles).toMap.filter(_._2.nonEmpty)
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = sets.map { case (id, ss) =>
      val common = ss.count(s => df(s) >= 5)
      (id, ss.size.toLong, common.toLong, common.toDouble / ss.size)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.trigramCoverage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }
}
