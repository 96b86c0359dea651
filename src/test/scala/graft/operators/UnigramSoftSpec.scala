package graft.operators

import graft.SparkSpec

/** The soft-EM round must be measurably SOFTER than hard EM: on a vocab
  * where near-optimal segmentations carry real posterior mass, expected
  * counts keep (or promote) pieces the argmin path alone would starve,
  * and the round-2 model re-segments differently. Also pins the exact
  * integer posterior arithmetic of [[Unigram.softUsageOne]] — tie
  * splitting, half-up rounding, and the 2^-SoftWindow truncation — the
  * quantities the DuckDB oracle recomputes from the all-paths chain. */
class UnigramSoftSpec extends SparkSpec {

  private def segMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("word", "seg").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("soft and hard EM disagree where near-optimal paths carry mass") {
    import spark.implicits._
    // Found by brute-force search over the exact quantization: in round
    // 1 the argmin paths starve "aaab", so hard EM prunes it; the soft
    // posterior credits it with enough expected mass across the two
    // words' near-tied segmentations to survive MinPieceCount, and the
    // round-2 decode uses it in BOTH words.
    val vocab = Seq(("abaaab", 1L), ("aaabbb", 5L)).toDF("word", "freq")
    val hard = segMap(Unigram.emSegment(spark, vocab))
    val soft = segMap(Unigram.emSoftSegment(spark, vocab))
    assert(hard == Map("abaaab" -> "a b a aa b", "aaabbb" -> "aa abbb"),
      s"hard-EM round-2 segmentation drifted: $hard")
    assert(soft == Map("abaaab" -> "a b aaab", "aaabbb" -> "aaab b b"),
      s"soft-EM round-2 segmentation drifted: $soft")
    assert(hard != soft, "soft EM must be observable on this vocab")
  }

  test("exact tie: posterior mass splits evenly, half-up rounding applies") {
    // "a a" costs 2, "aa" costs 2 — an exact tie, so each path gets
    // weight 2^SoftWindow: E[a] = 1·(2·2^40)/2^41 = 1, and E[aa] =
    // 1·2^40/2^41 = 0.5 rounds HALF-UP to 1.
    val got = Unigram.softUsageOne("aa", 1L, Map("a" -> 1L, "aa" -> 2L))
    assert(got == Seq("a" -> 1L, "aa" -> 1L), s"got $got")
  }

  test("paths beyond the truncation window contribute exactly nothing") {
    // char spray costs 100 vs the whole-word 1: delta 99 > SoftWindow,
    // so the posterior is a point mass on "aa" and 'a' gets no usage row
    val got = Unigram.softUsageOne("aa", 7L, Map("a" -> 50L, "aa" -> 1L))
    assert(got == Seq("aa" -> 7L), s"got $got")
  }

  test("frequency scales expected counts exactly") {
    // same tie as above at freq 5: E[a] = 5, E[aa] = round(2.5) = 3
    val got = Unigram.softUsageOne("aa", 5L, Map("a" -> 1L, "aa" -> 2L))
    assert(got == Seq("a" -> 5L, "aa" -> 3L), s"got $got")
  }

  test("soft refinement keeps every word segmentable") {
    import spark.implicits._
    val vocab = Seq(("abcd", 50L), ("bcda", 50L)).toDF("word", "freq")
    val rows = Unigram.emSoftSegment(spark, vocab).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val cost = r.getAs[Long]("total_cost")
      assert(cost >= 0L && cost < Long.MaxValue,
        s"word ${r.getString(0)} must stay segmentable after soft pruning")
    }
  }
}
