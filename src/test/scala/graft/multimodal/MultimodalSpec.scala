package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("StubDecoder is deterministic and byte-driven") {
    val a = StubDecoder.decode("image", "hello world".getBytes("UTF-8"))
    val b = StubDecoder.decode("image", "hello world".getBytes("UTF-8"))
    assert(a.width == b.width && a.height == b.height &&
      a.feature.sameElements(b.feature))
    assert(a.width == 12 && a.height == (11 * 7) % 64 + 1)
    assert(a.feature.length == 8)
    assert(StubDecoder.decode("audio", Array[Byte]()).width == 1)
  }

  test("featureExtract preserves every row across partitions and batches") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).as[MediaRecord]
      .repartition(7)
    val out = Multimodal.featureExtract(media, StubDecoder, batchSize = 16)
    assert(out.count() == media.count())
    // schema is the typed contract a real decoder would fill
    assert(out.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "width", "height", "feature"))
  }

  test("decoded metadata matches the stub arithmetic exactly") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).as[MediaRecord]
    val row = Multimodal.featureExtract(media, StubDecoder)
      .filter($"doc_id" === 0).head()
    assert(row.width == (row.n_bytes % 64 + 1).toInt)
    assert(row.height == ((row.n_bytes * 7) % 64 + 1).toInt)
  }

  test("frameSample emits n byte-range frames per video, none for other media") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).as[MediaRecord]
    val frames = Multimodal.frameSample(media, 4).collect()
    val videos = media.filter(_.media_type == "video").count()
    assert(frames.length == videos * 4)
    assert(frames.forall(f => f.frame_idx >= 0 && f.frame_idx < 4))
    // byte ranges stay inside the payload
    assert(frames.forall(f => f.byte_offset + f.frame_bytes >= f.byte_offset))
  }

  test("resizeMeta preserves aspect ratio within integer truncation") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).as[MediaRecord]
    val decoded = Multimodal.featureExtract(media, StubDecoder)
    val resized = Multimodal.resizeMeta(decoded, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall { case (_, w, h) => w >= 1 && h >= 1 && math.max(w, h) <= 32 })
  }

  test("mm_media_stats covers all three media types with full counts") {
    val stats = Multimodal.mediaStats(spark, sfDir).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum ==
      graft.core.Tables.documents(spark, sfDir).count())
  }

  test("frameDedup emits 4 fingerprinted frames per video with consistent counts") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).as[MediaRecord]
    val videos = media.filter(_.media_type == "video").count()
    val rows = Multimodal.frameDedup(spark, sfDir).collect()
    assert(rows.length == videos * 4)
    // fp_count is the global multiplicity of that fingerprint
    val byFp = rows.groupBy(_.getString(2)).view.mapValues(_.length.toLong)
    assert(rows.forall(r => r.getLong(3) == byFp(r.getString(2))))
  }
}
