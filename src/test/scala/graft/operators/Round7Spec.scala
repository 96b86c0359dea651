package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 additions: CDC chunking edit-locality, KMV sketch accuracy on
  * both regimes, batch-perceptron learning, CUSUM changepoint location,
  * and k-core peeling (synthetic exactness + gate-scale fixpoint). */
class Round7Spec extends SparkSpec {

  import spark.implicits._

  // ---- CDC chunking ----

  private val baseWords = (0 until 80).map(i => s"w$i")

  test("CDC chunks reconstruct the token stream in chunk order") {
    val docs = Seq((1L, baseWords.mkString(" "))).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunkTexts(docs)
      .orderBy("chunk").select("chunk_text").as[String].collect()
    assert(chunks.length >= 2, "test doc should split into multiple chunks")
    assert(chunks.mkString(" ") == baseWords.mkString(" "))
  }

  test("CDC chunk boundaries are content-defined: a prepend edit only " +
    "changes the first chunk") {
    val docs = Seq(
      (1L, baseWords.mkString(" ")),
      (2L, "zz qq " + baseWords.mkString(" "))).toDF("doc_id", "text")
    val byDoc = Dedup.cdcChunkTexts(docs)
      .orderBy("doc_id", "chunk")
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val (orig, edited) = (byDoc(1L), byDoc(2L))
    // every chunk of the original except the first survives the edit —
    // the property fixed-size blocking lacks (one insert shifts every
    // block boundary after it)
    assert(orig.tail.nonEmpty)
    orig.tail.foreach(c => assert(edited.contains(c),
      s"post-boundary chunk '$c' should be unchanged by a prepend edit"))
  }

  // ---- KMV sketches ----

  test("KMV distinct falls back to the exact count below K") {
    // sf0.001 has ~15 users per event type, far under K=64
    val rows = AdvancedAggs.kmvDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") < AdvancedAggs.KmvK)
      assert(r.getAs[Long]("kmv_est") == r.getAs[Long]("exact_users"))
    }
  }

  test("KMV distinct estimate lands within 3 standard errors at sf0.01") {
    val rows = AdvancedAggs.kmvDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val est = r.getAs[Long]("kmv_est").toDouble
      assert(exact >= AdvancedAggs.KmvK, "sf0.01 should exercise the estimator path")
      // se ≈ 1/sqrt(K-2) ≈ 12.7%; allow 3 se
      assert(math.abs(est - exact) <= 3 * exact / math.sqrt(AdvancedAggs.KmvK - 2.0),
        s"${r.getAs[String]("event_type")}: est=$est exact=$exact")
    }
  }

  test("KMV Jaccard tracks the exact Jaccard") {
    val rows = AdvancedAggs.kmvJaccard(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val exact = r.getAs[Long]("jacc_exact_micro")
      val est = r.getAs[Long]("jacc_kmv_micro")
      // se of a K-sample binomial fraction is ≤ 1/(2√K) ≈ 6.3%; allow 5 se
      assert(math.abs(est - exact) <= 350000L, s"est=$est exact=$exact")
    }
  }

  // ---- batch perceptron ----

  test("batch perceptron learns: final weights beat the zero model") {
    val w = Features.perceptronTrain(spark, sfDir).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Long]("w")).toMap
    assert(w.size == Features.Dims + 1)
    assert(w.values.exists(_ != 0L))
    val feats = Features.featureRows(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("dim"), r.getAs[Long]("weight")))
    val labels = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val margins = feats.groupBy(_._1).map { case (d, rs) =>
      d -> (rs.map(t => t._3 * w(t._2)).sum + w(Features.Dims))
    }
    val mistakes = labels.count { case (d, y) => y * margins.getOrElse(d, 0L) <= 0 }
    // the zero model misclassifies all docs; training must do strictly
    // better — and in practice much better on the en-vs-rest task
    assert(mistakes < labels.size / 2,
      s"$mistakes mistakes over ${labels.size} docs")
  }

  // ---- CUSUM changepoint ----

  test("CUSUM finds a planted level shift at its exact day") {
    val daily = (1 to 10).map { d =>
      ("a", java.sql.Date.valueOf(f"2024-01-$d%02d"), if (d <= 5) 5L else 15L)
    }.toDF("event_type", "day", "c")
    val row = Events.cusumOverDaily(daily).collect().head
    // n=10, T=100: terms are -50 before the shift, +50 after; |S| peaks
    // at the last pre-shift day with S_5 = -250
    assert(row.getAs[String]("cp_day") == "2024-01-05")
    assert(row.getAs[Long]("s_abs_max") == 250L)
    assert(row.getAs[Long]("n_days") == 10L)
  }

  // ---- k-core ----

  test("k-core peeling keeps a K4 and peels a pendant chain") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u1", "u2")
    val core = Graph.kcoreEdges(edges, 3, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  // ---- bigram OOV scoring ----

  test("bigram OOV rates are valid fractions and reference bigrams score 0") {
    val rows = TextAnalysis.bigramOov(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val oov = r.getAs[Long]("n_oov")
      val micro = r.getAs[Long]("oov_micro")
      assert(r.getAs[Long]("doc_id") % 2 == 1, "only held-out docs are scored")
      assert(oov >= 0 && oov <= n)
      assert(micro == 1000000L * oov / n)
    }
  }

  // ---- link prediction ----

  test("link prediction candidates are non-adjacent and correctly scored") {
    val dir = "/root/testdata/sf0.01"
    val edges = Graph.copresenceEdges(spark, dir, 1L)
      .select("u1", "u2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Graph.linkPrediction(spark, dir).collect()
    assert(rows.nonEmpty)
    // driver-side recomputation of common-neighbor counts
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (a, b, cn) = (r.getAs[Long]("u1"), r.getAs[Long]("u2"), r.getAs[Long]("cn"))
      assert(!edges.contains((a, b)), s"($a,$b) must not already be an edge")
      val commons = nbrs(a).intersect(nbrs(b))
        .filter(m => nbrs(m).size <= Graph.LinkMidCap)
      assert(cn == commons.size, s"($a,$b): cn=$cn expected ${commons.size}")
    }
  }

  // ---- curriculum ordering ----

  test("curriculum positions are a 1..n permutation, easy buckets first") {
    val rows = TrainingPipeline.curriculumOrder(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"), r.getAs[Long]("position")))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
      "positions must be a contiguous permutation")
    assert(rows.map(_._1).distinct.length == rows.length, "each doc once")
    val byPos = rows.sortBy(_._3).map(_._2)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b },
      "difficulty buckets must be nondecreasing along the curriculum")
  }

  // ---- diversified top-k ----

  test("diversified top-k spans distinct quantizer cells per query") {
    val rows = Similarity.topkDiverse(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("label")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length,
        "each query's results must come from distinct cells")
    }
  }

  test("k-core reaches its fixpoint within the fixed round budget") {
    val dir = "/root/testdata/sf0.01"
    val e0 = Graph.copresenceEdges(spark, dir, 1L).select("u1", "u2")
    val at = Graph.kcoreEdges(e0, Graph.KCoreK, Graph.KCoreRounds).count()
    val beyond = Graph.kcoreEdges(e0, Graph.KCoreK, Graph.KCoreRounds + 1).count()
    assert(at == beyond, "one extra peel round must change nothing")
    assert(at > 0, "sf0.01 3-core should be nonempty")
  }
}
