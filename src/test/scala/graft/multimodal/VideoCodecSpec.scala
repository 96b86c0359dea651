package graft.multimodal

import graft.SparkSpec

/** The video twin of the PNG/WAV codec tests: containers synthesized by
  * [[VideoSynth]] must be real animated GIFs that round-trip every frame
  * and every pixel through `javax.imageio`'s multi-frame reader, and the
  * oracle-gated aggregates must equal driver-side closed-form values. */
class VideoCodecSpec extends SparkSpec {

  test("VideoSynth emits real animated GIFs that round-trip every frame") {
    for (d <- Seq(2L, 5L, 98L, 401L, 1001L)) {
      val bytes = VideoSynth.gif(d)
      // GIF89a magic
      assert(new String(bytes.take(6), "US-ASCII") == "GIF89a", s"doc $d magic")
      val (nf, w, h, _) = VideoSynth.params(d)
      val frames = GifFramesDecoder.decode(d, bytes)
      assert(frames.length == nf, s"doc $d frame count")
      for (fr <- frames) {
        assert(fr.width == w && fr.height == h, s"doc $d dims")
        assert(fr.gray_sum == VideoSynth.frameGraySum(d, fr.frame_idx),
          s"doc $d frame ${fr.frame_idx} gray sum")
      }
    }
  }

  test("decoder discovers the frame count from the stream, not metadata") {
    // a 1-frame GIF built directly, bypassing VideoSynth's count formula;
    // indexed palette (not TYPE_BYTE_GRAY) — the GIF writer quantizes
    // non-indexed rasters, which would break exactness. Dimensions stay
    // >= VideoSynth's 8x6 floor: the JDK GIF writer corrupts rasters with
    // height <= ~3 (middle rows decode as zeros — observed empirically),
    // which is why the synthesis formulas keep h >= 6.
    val g = Array.tabulate(256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, g, g, g)
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    (0 until 6).foreach(y => (0 until 8).foreach(x =>
      img.getRaster.setSample(x, y, 0, 10 * x)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val frames = GifFramesDecoder.decode(0L, bos.toByteArray)
    assert(frames.length == 1 && frames.head.width == 8 && frames.head.height == 6)
    assert(frames.head.gray_sum == 6 * (0 to 7).map(10 * _).sum)
  }

  test("mm_video_stats equals the closed-form frame statistics at sf") {
    val got = Multimodal.videoStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    val docIds = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 3 == 2)
    assert(docIds.nonEmpty)
    val expected = docIds.sorted.map { d =>
      val (nf, w, h, _) = VideoSynth.params(d)
      val sums = (0 until nf).map(f => VideoSynth.frameGraySum(d, f))
      (d, nf.toLong, w, h, sums.sum, sums.max)
    }.toSeq
    assert(got.toSeq == expected)
  }

  test("mm_video_cuts equals the closed-form lag statistics at sf") {
    val got = Multimodal.videoCuts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docIds = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 3 == 2)
    val expected = docIds.sorted.map { d =>
      val (nf, _, _, _) = VideoSynth.params(d)
      val sums = (0 until nf).map(f => VideoSynth.frameGraySum(d, f))
      val diffs = sums.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
      (d, nf.toLong, diffs.count(_ > 1000L).toLong, diffs.sum)
    }.toSeq
    assert(got.toSeq == expected)
  }
}
