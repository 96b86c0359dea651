package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Invariants of the training-pipeline operators beyond the oracle gate. */
class TrainingPipelineSpec extends SparkSpec {

  test("pack_sequences: lossless, contiguous, ordered packing manifest") {
    val manifest = TrainingPipeline.packSequences(spark, sfDir).collect()
    val totalToks = Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), "\\s+")).cast("long")))
      .head().getLong(0)
    val totalDocs = Tables.documents(spark, sfDir).count()

    // every token and every doc lands in exactly one chunk
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == totalDocs)

    manifest.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val byChunk = rows.sortBy(_.getAs[Long]("chunk"))
      // chunks are contiguous from 0 (a doc can straddle a budget
      // boundary, but the chunk where each doc STARTS advances by at
      // most its own token count, so no chunk index is ever skipped
      // entirely unless one doc spans multiple budgets — assert the
      // common invariant: indices strictly increase)
      assert(byChunk.head.getAs[Long]("chunk") == 0L, s"shard $shard starts late")
      val chunks = byChunk.map(_.getAs[Long]("chunk"))
      assert(chunks.distinct.length == chunks.length)
      // doc ranges are disjoint and ordered: packing follows doc_id order
      byChunk.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            s"shard $shard chunks overlap: $a vs $b")
        case _ =>
      }
      byChunk.foreach(r =>
        assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc")))
    }
  }

  test("decontamination flags exactly the docs sharing a 4-gram with the benchmark slice") {
    // differential check against a driver-side recomputation at sf0.001
    val flagged = TrainingPipeline.decontamination(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bench_docs")).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
    val grams: Map[Long, Set[Seq[String]]] = docs.map { case (id, toks) =>
      id -> toks.sliding(4).filter(_.size == 4).map(_.toSeq).toSet
    }.toMap
    val bench = grams.filter { case (id, _) => id % 19 == 0 }
    val expected = grams.collect {
      case (id, g) if id % 19 != 0 =>
        id -> bench.count { case (_, bg) => g.exists(bg.contains) }.toLong
    }.filter(_._2 > 0)
    assert(flagged == expected.toMap,
      s"only-spark=${flagged.toSet -- expected.toSet} only-naive=${expected.toSet -- flagged.toSet}")
  }
}
