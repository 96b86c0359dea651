package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Stream-batch parity for the KLL quantile sketch (r13 verdict item 7):
  * replaying the real lineitem corpus in canonical (h, uk, v) order
  * through [[StreamingPipelines.kllQuantileStream]]'s sequential
  * compactor reproduces the batch dataflow build's retained sketch
  * CONTENT item for item — same levels, same slots, same weights, same
  * hashes — because chunk membership and the per-(level, chunk) coin
  * are pure position arithmetic shared by both forms. Chunked feeding
  * proves the state machine is checkpoint-boundary-invariant (state
  * round-trips the encoder between micro-batches). */
class KllStreamSpec extends SparkSpec {

  test("canonical replay of lineitem equals the batch sketch content") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.functions.Registry.register(spark)
    val dir = sfDir
    val batch = graft.operators.Kll.kllContent(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSeq

    def h60(s: String): Long = graft.functions.HashUtil.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val rows = graft.core.Tables.lineitem(spark, dir)
      .selectExpr(
        "concat(cast(l_orderkey as string), '-', cast(l_linenumber as string)) as uk",
        "l_extendedprice as v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (uk, v) => (h60("kll:" + uk), uk, v) }.toSeq

    val in = MemoryStream[(String, Double)]
    val q = StreamingPipelines.kllQuantileStream(in.toDS())
      .writeStream.format("memory").queryName("kllstream")
      .outputMode(OutputMode.Update).start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      val all = spark.table("kllstream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      val maxSeen = all.map(_._7).max
      assert(maxSeen == rows.length.toLong)
      val latest = all.filter(_._7 == maxSeen)
        .map(t => (t._1, t._2, t._3, t._4, t._5, t._6))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(latest.nonEmpty && latest == batch.sortBy(t => (t._1, t._2)),
        s"stream sketch (${latest.length} rows) != batch (${batch.length})")
    } finally q.stop()
  }
}
