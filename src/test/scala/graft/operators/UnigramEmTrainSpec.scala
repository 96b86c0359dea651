package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multi-round trainer must keep TRAINING after the first E/M round —
  * the round-2-and-done shortcut is exactly what this pins against — and
  * must then settle (Kudo's trainer iterates to convergence; the
  * trajectory's n_seg_changed column is the convergence meter). */
class UnigramEmTrainSpec extends SparkSpec {

  test("a round-3 segmentation flip: E/M rounds beyond the first do real work") {
    import spark.implicits._
    // Found by brute-force search over the exact half-bit arithmetic:
    // round 1 (seed) segments "bababa" as "bab aba"; the round-1 usage
    // counts keep "abab" alive only through the dominant word "abab"
    // (freq 40) — after the ROUND-2 model re-concentrates mass on the
    // genuinely-chosen pieces, round 3 re-segments "bababa" through it
    // as "b abab a". A trainer that stopped after one E/M round would
    // never find this segmentation.
    val vocab = Seq(("bababa", 3L), ("abab", 40L), ("aabba", 2L))
      .toDF("word", "freq")
    val traj = Unigram.emTrajectory(spark, vocab, Unigram.EmRounds)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(traj(1L).getAs[Long]("n_seg_changed") == 0L, "round 1 is the baseline")
    assert(traj(3L).getAs[Long]("n_seg_changed") > 0L,
      "round 3 must flip a segmentation on this vocab")
    assert(traj(4L).getAs[Long]("n_seg_changed") == 0L,
      "the trainer must settle by round 4 on this vocab")
  }

  test("trajectory telemetry is internally consistent and monotone where it must be") {
    import spark.implicits._
    val vocab = Seq(("bababa", 3L), ("abab", 40L), ("aabba", 2L))
      .toDF("word", "freq")
    val rows = Unigram.emTrajectory(spark, vocab, Unigram.EmRounds).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to Unigram.EmRounds))
    // pruning only removes pieces: the inventory never grows after round 1
    val inv = rows.map(_.getAs[Long]("inv_size"))
    assert(inv.sliding(2).forall { case Array(a, b) => b <= a },
      s"inventory must shrink or hold: ${inv.toSeq}")
    // once the segmentation stops changing, every later round is a
    // fixed point (hard EM is deterministic in the model)
    val chg = rows.sortBy(_.getLong(0)).map(_.getAs[Long]("n_seg_changed"))
    val settledAt = chg.indexWhere(_ == 0L, 1)
    if (settledAt > 0)
      assert(chg.drop(settledAt).forall(_ == 0L),
        s"a settled trainer must stay settled: ${chg.toSeq}")
  }

  test("round 1 and round 2 of the trajectory equal the single-round gates") {
    // the trajectory's first two rounds ARE text_unigram_viterbi and
    // text_unigram_em — cross-check corpus_cost/corpus_pieces against
    // the independently-shipped single-round queries on the real corpus
    val traj = Unigram.unigramEmTrain(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def stats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("freq") * col("total_cost")),
        sum(col("freq") * col("n_pieces"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (c1, p1) = stats(Unigram.unigramViterbi(spark, sfDir))
    val (c2, p2) = stats(Unigram.unigramEm(spark, sfDir))
    assert((traj(1L).getAs[Long]("corpus_cost"),
      traj(1L).getAs[Long]("corpus_pieces")) == ((c1, p1)))
    assert((traj(2L).getAs[Long]("corpus_cost"),
      traj(2L).getAs[Long]("corpus_pieces")) == ((c2, p2)))
  }
}
