package graft.operators

import graft.SparkSpec
import graft.multimodal.Multimodal

/** Round-8 multimodal widening: the real area-average resample and the
  * first lossy (JPEG) codec gate. Each test recomputes the expected
  * values on the driver from the synth closed forms — never by decoding
  * through the same codec path the query uses. */
class Round8Spec extends SparkSpec {

  test("resize pixels match a closed-form driver recompute") {
    val docIds = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 3 == 0).sorted
    val expected = docIds.map { id =>
      val (w, h, dd) = graft.multimodal.ImageSynth.params(id)
      val (w2, h2) = Multimodal.AreaResample.dims(w, h, 32)
      def bounds(n: Int, k: Int) = (0 to k).map(i => i * n / k)
      val bx = bounds(w, w2)
      // pixels are column-constant, so the box sum factors as rows*colSum
      // and floor((rows*S)/(rows*nx)) = floor(S/nx) — sum per channel is
      // h2 * sum_i floor(colSum_i / nx_i)
      def chanSum(f: Int => Long): Long =
        h2.toLong * (0 until w2).map { i =>
          val s = (bx(i) until bx(i + 1)).map(f).sum
          s / (bx(i + 1) - bx(i))
        }.sum
      (id, w2, h2,
        chanSum(x => (x * 7 + dd) % 256),
        chanSum(x => (x * 11 + 2 * dd) % 256),
        chanSum(x => (x * 13 + 3 * dd) % 256))
    }.toSeq
    val got = Multimodal.resizePixels(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("JPEG decode stats match the closed form (lossy round trip exact)") {
    val docIds = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 3 == 0).sorted
    val expected = docIds.map { id =>
      val (w, h, dd) = Multimodal.JpegSynth.params(id)
      val blocks = for (bj <- 0 until h / 8; bi <- 0 until w / 8)
        yield (bi * 17 + bj * 29 + dd) % 256
      (id, w, h, blocks.map(_.toLong * 64).sum, blocks.distinct.size.toLong)
    }.toSeq
    val got = Multimodal.jpegStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }
}
