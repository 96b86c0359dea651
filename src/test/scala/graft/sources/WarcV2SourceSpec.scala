package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.v2.{WarcContainer, WarcV2Source}

/** The WARC-shaped container loop: pack `documents` into multi-record
  * container files, read them back through the `graft-warc` V2 connector,
  * and the result must equal the parquet table field-for-field; column
  * pruning must drop `payload` from the scan schema, and record_id range
  * predicates must prune container FILES at planning time. */
class WarcV2SourceSpec extends SparkSpec {

  private lazy val containerDir = WarcContainer.ensureWritten(spark, sfDir)

  private def warc = spark.read.format("graft-warc").load(containerDir)

  test("round-trip: container records equal the documents table exactly") {
    val got = warc
      .select("record_id", "target_uri", "lang", "uncompressed_length", "payload")
      .orderBy("record_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    val want = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(lit("http://example.invalid/"), col("source"), lit("/"),
          col("doc_id")).as("uri"),
        col("lang"), octet_length(col("text")).cast("long"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    assert(got.length == want.length && got.length > 0)
    assert(got.toSeq == want.toSeq)
  }

  test("column pruning: header-only projections drop payload from the scan") {
    val df = warc.select("record_id", "uncompressed_length")
    val scans = df.queryExecution.executedPlan.collect { case s: BatchScanExec => s }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n${df.queryExecution.executedPlan}")
    val schema = scans.head.scan.readSchema()
    assert(schema.fieldNames.toSeq == Seq("record_id", "uncompressed_length"),
      s"payload not pruned: ${schema.simpleString}")
    val total = df.agg(sum("uncompressed_length")).head.getLong(0)
    val want = graft.core.Tables.documents(spark, sfDir)
      .agg(sum(octet_length(col("text")).cast("long"))).head.getLong(0)
    assert(total == want)
  }

  test("payloads are stored gzip-per-record; Content-Length counts stored octets") {
    // Aggregate invariant: the stored spans differ from the text bytes
    // (compression is really on) and each record's Content-Length is the
    // compressed span — re-deflating the text with the writer's exact
    // codec settings must reproduce the stored length.
    val lens = warc.select("record_id", "content_length", "uncompressed_length")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val texts = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lens.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      val raw = t.getBytes("UTF-8")
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      val (stored, ulen) = lens(id)
      assert(ulen == raw.length, s"doc $id uncompressed_length")
      assert(stored == bos.size().toLong,
        s"doc $id Content-Length must equal the gzip'd span")
    }
    // and the raw container FILE carries gzip magic right after a header
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(containerDir))
    val first =
      try scala.jdk.CollectionConverters.IteratorHasAsScala(listing.iterator())
        .asScala.map(_.toString).filter(_.endsWith(".warc")).toSeq.sorted.head
      finally listing.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(first))
    val blank = "\r\n\r\n".getBytes("UTF-8")
    val at = bytes.indexOfSlice(blank)
    assert(at > 0 && (bytes(at + 4) & 0xff) == 0x1f &&
      (bytes(at + 5) & 0xff) == 0x8b,
      "first payload must start with the gzip magic 1f 8b")
  }

  test("record_id range predicates prune container files at planning time") {
    val nAll = warc.queryExecution.executedPlan
      .collect { case s: BatchScanExec => s }.head.inputRDD.getNumPartitions
    assert(nAll > 1, s"expected multiple container files, got $nAll")

    // ids strictly inside the FIRST container's range
    val df = warc.filter(col("record_id") < 5)
    val scans = df.queryExecution.executedPlan.collect { case s: BatchScanExec => s }
    assert(scans.head.scan.description().contains("record_id"),
      s"filter not pushed: ${scans.head.scan.description()}")
    assert(scans.head.inputRDD.getNumPartitions == 1,
      s"expected 1 surviving container, got ${scans.head.inputRDD.getNumPartitions}")
    assert(df.select("record_id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L to 4L))
  }

  test("CDX point lookup reads the index plus the spans, not the container") {
    import graft.sources.v2.WarcReadStats
    val ids = Seq(137L, 301L, 449L)
    WarcReadStats.reset()
    // no orderBy: a sort's range-partitioner sampling pass would run the
    // scan (and the counters) a second time
    val got = warc.filter(col("record_id").isin(ids: _*))
      .select("record_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // correctness of the seek path: full payloads, right records
    val want = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(ids: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    // the CDX path actually ran, once per surviving container
    val lookups = WarcReadStats.pointLookups.get()
    assert(lookups >= 1, "point lookup never took the CDX path")
    // bytes-read bound: index lines + the requested spans only — recompute
    // the exact expectation from the CDX files themselves and compare
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(containerDir))
    val cdxFiles =
      try scala.jdk.CollectionConverters.IteratorHasAsScala(listing.iterator())
        .asScala.map(_.toString).filter(_.endsWith(".cdx")).toSeq
      finally listing.close()
    assert(cdxFiles.nonEmpty, "pack wrote no CDX side indexes")
    var expected = 0L
    var containersWithHit = 0L
    cdxFiles.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      val spans = new String(bytes, "UTF-8").split("\n").iterator
        .filter(_.nonEmpty).map(_.split(" "))
        .filter(a => ids.contains(a(0).toLong)).map(_(2).toLong).toSeq
      // only containers surviving file-range pruning are opened at all
      if (spans.nonEmpty) {
        expected += bytes.length + spans.sum
        containersWithHit += 1
      }
    }
    assert(lookups == containersWithHit,
      s"CDX path ran $lookups times for $containersWithHit surviving containers")
    assert(WarcReadStats.pointBytesRead.get() == expected,
      s"point lookup touched ${WarcReadStats.pointBytesRead.get()} bytes, " +
        s"expected exactly $expected (cdx + spans)")
    // and that bound is a tiny fraction of the corpus the streaming path
    // would have read
    val totalWarc = cdxFiles.map(f => java.nio.file.Files.size(
      java.nio.file.Paths.get(f.stripSuffix(".cdx") + ".warc"))).sum
    assert(WarcReadStats.pointBytesRead.get() < totalWarc / 4,
      s"point lookup read ${WarcReadStats.pointBytesRead.get()} of $totalWarc " +
        "container bytes — not bounded")
  }

  test("CDX range scan reads index + contiguous spans in ONE run per container") {
    import graft.sources.v2.WarcReadStats
    val (lo, hi) = (graft.operators.Warc.RangeLo, graft.operators.Warc.RangeHi)
    WarcReadStats.reset()
    // no orderBy: a sort's range-partitioner sampling would re-run the scan
    val got = warc.filter(col("record_id") >= lo && col("record_id") <= hi)
      .select("record_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    val lookups = WarcReadStats.rangeLookups.get()
    assert(lookups >= 1, "range scan never took the CDX path")
    // exact bytes-read bound, recomputed from the CDX files themselves
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(containerDir))
    val cdxFiles =
      try scala.jdk.CollectionConverters.IteratorHasAsScala(listing.iterator())
        .asScala.map(_.toString).filter(_.endsWith(".cdx")).toSeq
      finally listing.close()
    var expected = 0L
    var containersWithHit = 0L
    cdxFiles.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      val spans = new String(bytes, "UTF-8").split("\n").iterator
        .filter(_.nonEmpty).map(_.split(" "))
        .filter { a => val id = a(0).toLong; id >= lo && id <= hi }
        .map(_(2).toLong).toSeq
      // only containers surviving file-range pruning are opened at all
      if (spans.nonEmpty) {
        expected += bytes.length + spans.sum
        containersWithHit += 1
      }
    }
    assert(lookups == containersWithHit,
      s"CDX range path ran $lookups times for $containersWithHit containers")
    assert(WarcReadStats.rangeBytesRead.get() == expected,
      s"range scan touched ${WarcReadStats.rangeBytesRead.get()} bytes, " +
        s"expected exactly $expected (cdx + selected spans)")
    // contiguous ids occupy contiguous bytes: the whole interval must
    // coalesce to exactly one seek+read per surviving container
    assert(WarcReadStats.rangeRuns.get() == containersWithHit,
      s"${WarcReadStats.rangeRuns.get()} read runs for $containersWithHit " +
        "containers — span coalescing regressed")
  }

  test("container layout: file names carry exact disjoint id ranges") {
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(containerDir))
    val ranges =
      try scala.jdk.CollectionConverters.IteratorHasAsScala(listing.iterator())
        .asScala.flatMap(p => p.getFileName.toString match {
          case WarcV2Source.FileName(c, lo, hi) => Some((c.toInt, lo.toLong, hi.toLong))
          case _ => None
        }).toSeq.sortBy(_._1)
      finally listing.close()
    assert(ranges.nonEmpty)
    // ranges tile [0, maxId] without overlap
    ranges.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) => assert(hi1 == lo2)
      case _ =>
    }
    val maxId = graft.core.Tables.documents(spark, sfDir)
      .agg(max("doc_id")).head.getLong(0)
    assert(ranges.last._3 == maxId + 1)
  }
}
