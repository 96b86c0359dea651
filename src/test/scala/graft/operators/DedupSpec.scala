package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Unit semantics of the dedup operators on a corpus with planted
  * duplicates (written to a temp parquet dir shaped like the documents
  * table, since the shipped testdata has no exact dups). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft-dedup").toString
    // 31 distinct tokens → 29 distinct shingles; swapping the final token
    // keeps 26 of them: jaccard 26/32 ≈ 0.81, just over the 0.8 threshold
    val base = (1 to 30).map(i => s"w$i").mkString(" ") + " today"
    val near = base.replace("today", "tomorrow")
    val other = "completely different content with nothing shared at all here"
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),     // exact dup of 0
      (2L, near, "en", "src2", near.length.toLong),     // near dup of 0
      (3L, other, "en", "src3", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("exact dedup clusters identical texts under the min doc_id") {
    val out = Dedup.exactDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("ngram jaccard finds the exact pair at 1.0 and the near pair above 0.8") {
    val pairs = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.8 && pairs((0L, 2L)) < 1.0)
    assert(pairs.keySet.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L, 2L)) })
  }

  test("minhash-lsh candidates cover the true near-dup pairs here") {
    val pairs = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs share every band; the 0.89-jaccard pair survives 4x4
    // banding with overwhelming probability under these fixed hashes
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical docs share a fingerprint, group sizes reflect it") {
    val rows = Dedup.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0L)._1 == rows(1L)._1)
    assert(rows(0L)._2 == 2 && rows(1L)._2 == 2)
    assert(rows(3L)._1 != rows(0L)._1)
  }

  test("simhash pairs: exact and near dups surface with their hamming distance") {
    val rows = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the exact dup pair is at hamming 0; candidates never include a pair
    // beyond hamming 3 (the verification filter is part of the contract)
    assert(rows.get((0L, 1L)).contains(0L), s"exact dup pair missing: $rows")
    assert(rows.values.forall(_ <= 3L))
  }

  test("property: 4x8-bit banding is lossless for any pair within hamming 3") {
    // Manku et al.'s pigeonhole: <=3 differing bits touch <=3 of the 4
    // bands, so one band is untouched and the pair shares its value. The
    // planner-side banding relies on exactly this.
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() & 0xffffffffL
      val nBits = rnd.nextInt(4) // 0..3 flipped bits
      val flips = Seq.fill(nBits)(rnd.nextInt(32)).distinct
      val b = flips.foldLeft(a)((acc, j) => acc ^ (1L << j))
      val sharesBand = (0 until 4).exists(band =>
        ((a >> (band * 8)) & 255) == ((b >> (band * 8)) & 255))
      assert(sharesBand,
        f"pair a=$a%08x b=$b%08x (hamming ${java.lang.Long.bitCount(a ^ b)}) shares no band")
    }
  }

  test("prefix-filtered jaccard differentially equals set arithmetic on random corpora") {
    // the oracle gate proves equality on the shipped data; this drives the
    // prefix filter through adversarial random corpora (mutations at BOTH
    // doc ends, boundary-grazing similarities) against a plain Scala-set
    // reference of the same definition
    val rnd = new scala.util.Random(4242)
    val vocab = (1 to 25).map(i => s"t$i")
    def shingles(text: String): Set[String] =
      text.split("\\s+").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    for (round <- 1 to 4) {
      val base = Seq.fill(30 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val docs = (0 until 12).map { i =>
        val toks = base.toArray
        // mutate 0..3 positions, including first/last, to graze the threshold
        (0 until rnd.nextInt(4)).foreach { _ =>
          val pos = rnd.nextInt(3) match {
            case 0 => 0
            case 1 => toks.length - 1
            case _ => rnd.nextInt(toks.length)
          }
          toks(pos) = vocab(rnd.nextInt(vocab.size))
        }
        (i.toLong, toks.mkString(" "))
      }
      val expected = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        sa = shingles(ta); sb = shingles(tb)
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= 0.8
      } yield (a, b, j)).toSet

      val tmp = java.nio.file.Files.createTempDirectory(s"graft-jacc-$round").toString
      docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Dedup.ngramJaccard(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"round $round: got ${got.size}, expected ${expected.size}")
    }
  }

  test("fingerprint: exact dups collide, different docs do not") {
    val rows = graft.operators.TextAnalysis.fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0L)._1 == rows(1L)._1 && rows(0L)._2 == 2)
    assert(rows(3L)._1 != rows(0L)._1)
  }
}
