package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Equivalence proofs for the probe-sample bounds on the three exact
  * baseline queries (dedup_embedding_cosine, dedup_substring_pairs,
  * dedup_semantic): each shipped query evaluates a FIXED probe /
  * representative side against the full corpus so its plan stays linear
  * in corpus size, and these tests pin the contract both ways —
  *
  *  1. at the shipped bound the gate-scale result is EXACTLY the
  *     unbounded baseline's (the bound is ≥ the corpus size, so it never
  *     binds at gate scale), and
  *  2. at a deliberately NON-vacuous bound the bounded query equals the
  *     unbounded computation restricted to the probe side — i.e. the
  *     bound only ever restricts which probes are asked about, never
  *     changes any answered pair.
  */
class BoundedBaselineSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("embedding cosine: shipped bound vacuous at gate scale; " +
    "non-vacuous bound = unbounded restricted to probe side") {
    val unbounded = Similarity.embeddingNearDupBounded(spark, sfDir, Long.MaxValue)
    assert(rows(Similarity.embeddingNearDup(spark, sfDir)) == rows(unbounded))
    val probed = Similarity.embeddingNearDupBounded(spark, sfDir, 100L)
    assert(rows(probed) == rows(unbounded.filter(col("vec_a") < 100L)))
  }

  test("substring pairs: shipped bound vacuous at gate scale; " +
    "non-vacuous bound = unbounded restricted to probe side") {
    val unbounded = SubstringDedup.substringPairsBounded(spark, sfDir, Long.MaxValue)
    assert(rows(SubstringDedup.substringPairs(spark, sfDir)) == rows(unbounded))
    val probed = SubstringDedup.substringPairsBounded(spark, sfDir, 50L)
    assert(rows(probed) == rows(unbounded.filter(col("doc_a") < 50L)))
  }

  test("semantic dedup: shipped cap vacuous at gate scale; " +
    "capped counts = uncapped pair relation restricted to representative side") {
    val shipped = Similarity.semanticDedup(spark, sfDir)
    val uncapped = Similarity.semanticDedupBounded(spark, sfDir, Long.MaxValue)
    assert(rows(shipped) == rows(uncapped))

    // Non-vacuous cap: recompute the capped aggregate EXACTLY from the
    // uncapped pair relation (cell-mates at cos >= 0.3), keeping only
    // pairs whose comparison side is a representative (vec_b < cap).
    val cap = 100L
    val pairs = Similarity.semanticDupPairs(spark, sfDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expDups = pairs.filter(_._2 < cap).groupBy(_._1)
      .map { case (v, ps) => v -> (ps.length.toLong,
        ps.count(p => p._2 < p._1).toLong) }
    val capped = Similarity.semanticDedupBounded(spark, sfDir, cap).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val uc = uncapped.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(capped.map(_._1).toSet == uc.keySet, "same vector universe")
    capped.foreach { case (v, nDups, keep) =>
      val (expN, expLower) = expDups.getOrElse(v, (0L, 0L))
      assert(nDups == expN, s"n_dups for $v under cap $cap")
      assert(keep == (expLower == 0L), s"keep flag for $v under cap $cap")
    }
  }
}
