package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hard-EM round must be a TRAINER, not a re-scorer: on a vocabulary
  * where the seed model (substring-occurrence counts) and the usage model
  * (pieces the DP actually chooses) disagree, the round-2 segmentation
  * must change. Also pins the refinement's two structural guarantees:
  * inventory pruning (multi-char pieces never chosen disappear) and
  * segmentability (every word still segments after pruning). */
class UnigramEmSpec extends SparkSpec {

  private def segMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("word", "seg").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("EM round flips a segmentation where seed and usage models disagree") {
    import spark.implicits._
    // Found by brute-force search over the exact quantization: in
    // "aabab", the seed model favors the piece "abab" (high substring
    // count via "ababbb"), but round 1 never CHOOSES "abab" inside the
    // dominant word "ababbb" (freq 20), so its usage collapses and the
    // round-2 model re-segments "aabab" through the genuinely-used "ab".
    val vocab = Seq(("ababbb", 20L), ("aabab", 5L)).toDF("word", "freq")
    val r1 = segMap(Unigram.viterbiSegment(spark, vocab))
    val r2 = segMap(Unigram.emSegment(spark, vocab))
    assert(r1("aabab") == "a abab",
      s"seed-model segmentation expected 'a abab', got '${r1("aabab")}'")
    assert(r2("aabab") == "a ab ab",
      s"post-EM segmentation expected 'a ab ab', got '${r2("aabab")}'")
    assert(r1 != r2, "the EM round must be observable on this vocab")
  }

  test("EM prunes never-chosen multi-char pieces but keeps words segmentable") {
    import spark.implicits._
    // Single dominant whole-word piece: round 1 segments both words as
    // themselves, so interior n-grams ("bc", "abc", ...) get zero usage
    // and must leave the inventory; every word must STILL segment
    // (single chars are unconditional), with finite total cost.
    val vocab = Seq(("abcd", 50L), ("bcda", 50L)).toDF("word", "freq")
    val r2 = Unigram.emSegment(spark, vocab)
    val rows = r2.collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val cost = r.getAs[Long]("total_cost")
      assert(cost >= 0L && cost < Long.MaxValue,
        s"word ${r.getString(0)} must stay segmentable post-pruning")
    }
    // whole words were the round-1 choices, so they survive EM intact
    assert(segMap(r2) == Map("abcd" -> "abcd", "bcda" -> "bcda"))
  }

  test("corpus EM query agrees with the independently-computed driver replica") {
    // End-to-end on the real sf table: replicate seed -> E -> M -> DP in
    // plain Scala on the collected vocab and compare every column.
    import spark.implicits._
    val vocab = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val words = vocab.as[(String, Long)].collect().toMap
    // seed counts
    val cnt = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, f) =>
      for (s <- 0 until w.length;
           k <- 1 to math.min(Unigram.MaxPieceLen, w.length - s))
        cnt.updateWith(w.substring(s, s + k))(c => Some(c.getOrElse(0L) + f))
    }
    def costsOf(kept: Map[String, Long]): Map[String, Long] = {
      def c2l(c: Long): Long = java.lang.Long.toBinaryString(c * c).length.toLong
      val t = c2l(kept.values.sum)
      kept.map { case (p, c) => p -> (t - c2l(c)) }
    }
    val seedKept = cnt.toMap.filter { case (p, c) =>
      p.length == 1 || c >= Unigram.MinPieceCount }
    val costs1 = costsOf(seedKept)
    val usage = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, f) =>
      Unigram.viterbi(w, costs1).seg.split(" ").foreach(p =>
        usage.updateWith(p)(c => Some(c.getOrElse(0L) + f)))
    }
    val alphabet = words.keysIterator.flatMap(_.toCharArray).map(_.toString).toSet
    val kept2 = alphabet.iterator.map(a => a -> usage.getOrElse(a, 0L)).toMap ++
      usage.iterator.filter { case (p, c) =>
        p.length > 1 && c >= Unigram.MinPieceCount }
    val costs2 = costsOf(kept2)
    val expect = words.map { case (w, f) =>
      val r = Unigram.viterbi(w, costs2)
      w -> ((f, r.n_pieces, r.total_cost, r.seg))
    }
    val got = Unigram.emSegment(spark, vocab).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
    assert(got == expect)
  }
}
