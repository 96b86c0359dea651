package graft.operators

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  private def init(words: (String, Long)*): Array[(String, Long, Array[String])] =
    words.toArray.map { case (w, c) =>
      (w, c, w.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else "##" + ch
      }.toArray)
    }

  test("scored pick prefers rare-together pairs over raw pair count " +
    "(the WordPiece-vs-BPE distinction)") {
    // BPE's count argmax would pick (a, ##b) at count 10; the likelihood
    // score 10/(10·11) ≈ 0.09 loses to (c, ##d) at 1/(2·1) = 0.5.
    val merges = WordPiece.trainDriver(
      init("ab" -> 10L, "cb" -> 1L, "cd" -> 1L), 1)
    assert(merges.head._2 == "c" && merges.head._3 == "##d")
    assert(merges.head._4 == "cd")
    assert((merges.head._5, merges.head._6, merges.head._7) == ((1L, 2L, 1L)))
  }

  test("quantized-score ties break lexicographically on (l, r)") {
    // both pairs score exactly 1/19 → q ties → (a, ##a) < (a, ##b)
    val merges = WordPiece.trainDriver(init("aa" -> 10L, "ab" -> 9L), 1)
    assert(merges.head._2 == "a" && merges.head._3 == "##a")
  }

  test("merged symbols strip the continuation prefix of the right piece " +
    "and keep the left piece's position class") {
    val merges = WordPiece.trainDriver(
      init("abc" -> 3L, "bc" -> 2L), 8)
    merges.foreach { case (_, l, r, m, _, _, _) =>
      assert(r.startsWith("##"), s"right piece '$r' must be a continuation")
      assert(m == l + r.substring(2))
    }
  }

  test("greedy longest-match segmentation reconstructs the word and is " +
    "longest-first") {
    val vocab = Set("u", "##n", "##a", "##f", "##fable", "##able", "un",
      "##b", "##l", "##e", "unf")
    val toks = WordPiece.encodeWord("unfable", vocab)
    // longest-first: "unf" beats "un" and "u"; then "##able" beats "##a"
    assert(toks == Vector("unf", "##able"))
    val rebuilt = toks.head + toks.tail.map(_.substring(2)).mkString
    assert(rebuilt == "unfable")
  }

  test("corpus trainer emits the full merge budget with well-formed rows " +
    "and the encode gate's token counts bound correctly") {
    val train = WordPiece.wordpieceTrain(spark, sfDir).collect()
    assert(train.length > 0 && train.length <= 48)
    train.foreach { r =>
      val (l, rr, m) = (r.getString(1), r.getString(2), r.getString(3))
      assert(rr.startsWith("##") && m == l + rr.substring(2))
      assert(r.getLong(4) > 0 && r.getLong(5) > 0 && r.getLong(6) > 0)
    }
    val enc = WordPiece.wordpieceEncode(spark, sfDir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      // every word is ≥ 1 token; no word explodes past its char count
      assert(r.getLong(2) >= r.getLong(1))
    }
  }
}
