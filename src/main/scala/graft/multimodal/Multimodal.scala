package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, and
  * decode/feature-extract runs partition-wise in batches — the exact shape
  * a Python `mapInPandas`/Arrow pipeline has, expressed with typed Scala
  * `mapPartitions` here.
  *
  * The DECODER IS A STUB: [[StubDecoder]] derives deterministic fake
  * dimensions and features from the raw bytes, standing in for the actual
  * image/audio codec libraries that are not available in this environment.
  * Everything around it — the media schema, the binary column handling, the
  * batch iteration shape, the typed output encoder, the partition-local
  * execution with no driver involvement — is real and tested, so swapping
  * in a real codec is a one-object change.
  *
  * Scale notes: decode work is embarrassingly parallel per partition; batch
  * iteration bounds peak memory to `batchSize` decoded items per task;
  * metadata aggregation afterwards is an ordinary hash agg on a
  * low-cardinality key. Binary payloads never pass through the driver.
  */
case class MediaRecord(doc_id: Long, media_type: String, media: Array[Byte])
case class DecodedMedia(width: Int, height: Int, feature: Array[Float])
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, feature: Array[Float])

trait MediaDecoder extends Serializable {
  def decode(mediaType: String, bytes: Array[Byte]): DecodedMedia
}

/** Deterministic fake decoder (STUB — see class docs above). Dimensions and
  * the 8-dim "feature" are pure functions of the payload bytes, so results
  * are reproducible and SQL-mirrorable for the oracle. */
object StubDecoder extends MediaDecoder {
  override def decode(mediaType: String, bytes: Array[Byte]): DecodedMedia = {
    val n = bytes.length
    val width = (n % 64) + 1
    val height = ((n * 7) % 64) + 1
    val feature = Array.tabulate(8) { i =>
      var s = 0L
      var j = i
      while (j < n) { s += bytes(j) & 0xff; j += 8 }
      s.toFloat
    }
    DecodedMedia(width, height, feature)
  }
}

object Multimodal {

  /** Synthesizes a media table from `documents` (no binary table ships in
    * the testdata): payload = UTF-8 bytes of the text, media_type cycles
    * image/audio/video by doc_id. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      expr("element_at(array('image','audio','video'), cast(doc_id % 3 as int) + 1)")
        .as("media_type"),
      col("text").cast("binary").as("media"))

  /** Partition-wise batched decode: the multimodal hot path. One task
    * decodes its partition in `batchSize` chunks (bounding peak decoded
    * memory), emitting typed feature rows. */
  def featureExtract(
      media: Dataset[MediaRecord],
      decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val d = decoder.decode(r.media_type, r.media)
          MediaFeatures(r.doc_id, r.media_type, r.media.length.toLong,
            d.width, d.height, d.feature)
        }
      }
    }
  }

  /** Frame metadata for sampled video frames. */
  case class FrameRecord(
      doc_id: Long, frame_idx: Int, byte_offset: Long, frame_bytes: Long)

  /** STUB frame sampler (video decode unavailable — see class docs): emits
    * `n` evenly-spaced "frames" per video payload, each a byte-range view
    * (offset + length) into the binary column. The row-expansion shape
    * (one payload → n typed frame rows via flatMap) is exactly what a real
    * keyframe extractor produces; only the byte-range arithmetic stands in
    * for the codec. */
  def frameSample(media: Dataset[MediaRecord], n: Int): Dataset[FrameRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val total = r.media.length.toLong
      val stride = math.max(total / n, 1L)
      (0 until n).iterator.map { i =>
        val off = i * stride
        FrameRecord(r.doc_id, i, math.min(off, total),
          math.min(stride, math.max(total - off, 0L)))
      }
    }
  }

  /** STUB resize: new dimensions are deterministic functions of the target
    * box and source metadata (aspect-preserving fit); the real pixel work
    * would live in the decoder. */
  def resizeMeta(decoded: Dataset[MediaFeatures], maxSide: Int): Dataset[(Long, Int, Int)] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { m =>
      val scaleNum = maxSide.toLong
      val longest = math.max(m.width, m.height).toLong
      val w2 = ((m.width * scaleNum) / longest).toInt
      val h2 = ((m.height * scaleNum) / longest).toInt
      (m.doc_id, math.max(w2, 1), math.max(h2, 1))
    }
  }

  /** Per-video frame-sampling stats — oracle-gated: the stub's byte-range
    * arithmetic is mirrored in SQL. */
  def frameStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    frameSample(media, 4)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        max(col("byte_offset")).as("max_offset"),
        sum(col("frame_bytes")).as("sampled_bytes"))
      .orderBy("doc_id")
  }

  /** Metadata stats per media type over the decoded stream — the
    * oracle-gated query exercising the full binary→decode→aggregate path. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    featureExtract(media, StubDecoder)
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
        (sum(col("height")).cast("double") / count(lit(1))).as("avg_height"))
      .orderBy("media_type")
  }

  /** Aspect-preserving resize plan for every decoded item (32-px box) —
    * oracle-gated: [[resizeMeta]]'s integer fit arithmetic is mirrored in
    * SQL over the stub dimensions. */
  def resizeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    resizeMeta(featureExtract(media, StubDecoder), 32)
      .toDF("doc_id", "r_width", "r_height")
      .orderBy("doc_id")
  }

  /** Frame-level exact dedup across videos: every sampled frame's content
    * slice is fingerprinted (md5) and counted corpus-wide — the multimodal
    * twin of [[graft.operators.Dedup.exactDedup]], catching payload reuse
    * across containers (e.g. the same intro frames in many videos). The
    * slice arithmetic is [[frameSample]]'s, applied to the payload text so
    * the oracle can recompute identical fingerprints; the ONE shuffle is
    * the fingerprint window. */
  /** (doc_id, frame_idx, frame_text) for every sampled video frame —
    * [[frameSample]]'s slice arithmetic applied to the payload text so
    * oracles can recompute identical content. */
  private def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    media.filter(_.media_type == "video").flatMap { r =>
      val s = new String(r.media, java.nio.charset.StandardCharsets.UTF_8)
      val total = s.length.toLong
      val stride = math.max(total / 4, 1L)
      (0 until 4).iterator.map { i =>
        val off = math.min(i * stride, total)
        val len = math.min(stride, math.max(total - off, 0L))
        (r.doc_id, i, s.substring(off.toInt, (off + len).toInt))
      }
    }.toDF("doc_id", "frame_idx", "frame_text")
  }

  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    videoFrames(spark, dir)
      .withColumn("frame_fp", md5(col("frame_text")))
      .withColumn("fp_count", count(lit(1)).over(Window.partitionBy(col("frame_fp"))))
      .select(col("doc_id"), col("frame_idx"), col("frame_fp"), col("fp_count"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Scene-change (shot-boundary) detection per video: a cut is a sampled
    * frame whose fingerprint differs from its predecessor's — the
    * fingerprint-lag formulation every video pipeline uses for cheap
    * shot segmentation (with real decode the fp would be a perceptual
    * hash; the Spark plumbing is identical). One lag window per video,
    * partitioned by doc_id; output is a per-video summary. */
  def sceneChange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    videoFrames(spark, dir)
      .withColumn("frame_fp", md5(col("frame_text")))
      .withColumn("prev_fp", lag(col("frame_fp"), 1).over(w))
      .withColumn("is_cut",
        when(col("prev_fp").isNotNull && col("prev_fp") =!= col("frame_fp"), 1L)
          .otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("is_cut")).as("n_cuts"),
        countDistinct(col("frame_fp")).as("n_distinct_frames"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_scene_change" -> (sceneChange _),
    "mm_media_stats" -> (mediaStats _),
    "mm_frame_stats" -> (frameStats _),
    "mm_resize_stats" -> (resizeStats _),
    "mm_frame_dedup" -> (frameDedup _)
  )

  /** The oracle re-derives the stub's deterministic metadata arithmetic in
    * SQL over the same payload bytes. */
  val oracle: Map[String, String] = Map(
    "mm_scene_change" ->
      """WITH vids AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS total,
        |    greatest(CAST(length(text) AS BIGINT) // 4, 1) AS stride
        |  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) + 1 = 3),
        |frames AS (SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |    md5(substr(text, CAST(least(i * stride, total) AS INTEGER) + 1,
        |        CAST(least(stride, greatest(total - i * stride, 0)) AS INTEGER))) AS frame_fp
        |  FROM vids, UNNEST(range(4)) AS u(i)),
        |cuts AS (SELECT doc_id, frame_fp,
        |    CASE WHEN lag(frame_fp) OVER (PARTITION BY doc_id ORDER BY frame_idx)
        |              IS NOT NULL
        |          AND lag(frame_fp) OVER (PARTITION BY doc_id ORDER BY frame_idx)
        |              <> frame_fp
        |         THEN 1 ELSE 0 END AS is_cut
        |  FROM frames)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |  CAST(SUM(is_cut) AS BIGINT) AS n_cuts,
        |  COUNT(DISTINCT frame_fp) AS n_distinct_frames
        |FROM cuts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_media_stats" ->
      """WITH m AS (SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes FROM documents)
        |SELECT media_type, COUNT(*) AS n_items,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(n_bytes % 64 + 1) AS DOUBLE) / COUNT(*) AS avg_width,
        |  CAST(SUM((n_bytes * 7) % 64 + 1) AS DOUBLE) / COUNT(*) AS avg_height
        |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin,
    "mm_resize_stats" ->
      """WITH m AS (SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n FROM documents),
        |wh AS (SELECT doc_id,
        |  CAST(n % 64 + 1 AS BIGINT) AS w,
        |  CAST((n * 7) % 64 + 1 AS BIGINT) AS h FROM m)
        |SELECT doc_id,
        |  CAST(greatest((w * 32) // greatest(w, h), 1) AS INTEGER) AS r_width,
        |  CAST(greatest((h * 32) // greatest(w, h), 1) AS INTEGER) AS r_height
        |FROM wh ORDER BY doc_id""".stripMargin,
    "mm_frame_dedup" ->
      """WITH vids AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS total,
        |    greatest(CAST(length(text) AS BIGINT) // 4, 1) AS stride
        |  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) + 1 = 3),
        |frames AS (SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |    md5(substr(text, CAST(least(i * stride, total) AS INTEGER) + 1,
        |        CAST(least(stride, greatest(total - i * stride, 0)) AS INTEGER))) AS frame_fp
        |  FROM vids, UNNEST(range(4)) AS u(i))
        |SELECT doc_id, frame_idx, frame_fp,
        |  COUNT(*) OVER (PARTITION BY frame_fp) AS fp_count
        |FROM frames ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_stats" ->
      """WITH vids AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS total,
        |    greatest(octet_length(CAST(text AS BLOB)) // 4, 1) AS stride
        |  FROM documents WHERE CAST(doc_id % 3 AS INTEGER) + 1 = 3),
        |frames AS (
        |  SELECT doc_id, i AS frame_idx,
        |    least(i * stride, total) AS byte_offset,
        |    least(stride, greatest(total - i * stride, 0)) AS frame_bytes
        |  FROM vids, UNNEST(range(4)) AS u(i))
        |SELECT doc_id, COUNT(*) AS n_frames,
        |  CAST(MAX(byte_offset) AS BIGINT) AS max_offset,
        |  CAST(SUM(frame_bytes) AS BIGINT) AS sampled_bytes
        |FROM frames GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
