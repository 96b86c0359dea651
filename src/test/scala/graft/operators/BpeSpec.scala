package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook greedy left-to-right non-overlapping BPE merge. */
  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Seq[String], steps: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab = counts.map { case (w, c) => w -> (c, w.map(_.toString).toVector) }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to steps) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (c, syms) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.nonEmpty) {
        val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        vocab = vocab.map { case (w, (c2, syms)) => w -> (c2, refMerge(syms, l, r)) }
      }
    }
    (merges.result(), vocab.map { case (w, (_, syms)) => w -> syms })
  }

  test("fold-based merge expression equals the textbook greedy merge") {
    val cases = Seq(
      ("aaaa", "a", "a"), ("aaa", "a", "a"), ("ababab", "a", "b"),
      ("banana", "a", "n"), ("mississippi", "s", "s"), ("x", "x", "x"),
      ("abcabc", "b", "c"), ("aabb", "a", "b"))
    val df = cases.map(_._1).toDF("word")
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    cases.zipWithIndex.foreach { case ((w, l, r), _) =>
      val got = df.filter(col("word") === w)
        .withColumn("m", expr(
          s"aggregate(syms, cast(array() as array<string>), (acc, x) -> " +
            s"case when size(acc) > 0 and try_element_at(acc, -1) = '$l' and x = '$r' " +
            s"then concat(slice(acc, 1, size(acc) - 1), array('${l + r}')) " +
            s"else concat(acc, array(x)) end)"))
        .select("m").head().getSeq[String](0).toVector
      assert(got == refMerge(w.map(_.toString).toVector, l, r), s"$w merge ($l,$r)")
    }
  }

  test("distributed BPE training equals a single-threaded reference on the corpus") {
    val words = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).as[String].collect().toSeq
    // Steps=128 exceeds the corpus's exhaustion point (31 distinct words,
    // 89 merges realized) — the reference trains to the same budget and
    // both stop when pair counts empty, so the FULL trajectory compares.
    val (refMerges, refVocab) = refTrain(words, 128)
    val got = Bpe.bpeMerges(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.length == refMerges.length,
      s"merge trajectories must exhaust together (${got.length} vs ${refMerges.length})")
    assert(got.length > 64 && got.length < 128,
      "corpus must exhaust strictly inside the budget")
    assert(got.map(_._1).toSeq == (1 to got.length), "contiguous steps")
    got.zip(refMerges).foreach { case ((k, l, r, m, c), (rl, rr, rc)) =>
      assert((l, r, c) == (rl, rr, rc), s"step $k")
      assert(m == l + r, s"step $k merged symbol")
    }
    // max pair count is non-increasing across merge steps
    got.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "pair counts must be non-increasing")
      case _ =>
    }
    // encode: per-doc token counts equal applying the reference vocab
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(w => refVocab(w).size.toLong).sum)
    }.sortBy(_._1).toSeq
    val enc = Bpe.bpeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc == expected)
  }
}
