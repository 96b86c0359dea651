package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingPipelines.{DayPeak, SessionOut}

/** Stream-batch parity for the peak-concurrency sweep-line: replaying the
  * real events table's closed sessions (driver-recomputed, fed in
  * CLOSURE order — end-time ascending, the order a streaming sessionizer
  * emits them, which interleaves start deltas out of time order) must
  * reproduce `evt_peak_concurrency`'s per-day peaks exactly after the
  * documented carry fold over the one-row-per-day output. */
class StreamingPeakConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("stream-batch parity: streaming peak concurrency equals the batch sweep-line") {
    implicit val sqlCtx = spark.sqlContext

    // Closed sessions recomputed on the driver (30-min gap rule), never
    // via the streaming path under test.
    val byUser = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .groupBy(_._1)
    val sessions = byUser.toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3.getTime, e._2))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (st, en) ms
      var st = -1L; var en = -1L
      sorted.foreach { case (_, _, t) =>
        val ms = t.getTime
        if (st < 0) { st = ms; en = ms }
        else if (ms - en > 1800L * 1000) { out += ((st, en)); st = ms; en = ms }
        else en = ms
      }
      if (st >= 0) out += ((st, en))
      out.map { case (s, e) =>
        SessionOut(uid, new Timestamp(s), new Timestamp(e), 1L, 0.0)
      }
    }.sortBy(_.session_end.getTime) // closure order

    val batch = graft.operators.Events.peakConcurrency(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val in = MemoryStream[SessionOut]
    val q = StreamingPipelines.peakConcurrency(in.toDS())
      .writeStream.format("memory").queryName("conc_parity")
      .outputMode(OutputMode.Append).start()
    try {
      val chunks = sessions.grouped(math.max(1, sessions.length / 3)).toSeq
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      // Flush: a far-future session pushes the watermark past every real
      // day's end + slack so all day keys time out and finalize.
      val far = sessions.last.session_end.getTime + 40L * 24 * 3600 * 1000
      val flush = SessionOut(-1L, new Timestamp(far), new Timestamp(far), 1L, 0.0)
      in.addData(flush); q.processAllAvailable()
      in.addData(flush.copy(session_start = new Timestamp(far + 1000),
        session_end = new Timestamp(far + 1000)))
      q.processAllAvailable()

      val flushDays = Set(
        java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(far)),
        java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(far + 2000)))
      val dayRows = spark.table("conc_parity").as[DayPeak].collect()
        .filter(p => !flushDays.contains(p.day))
      assert(dayRows.map(_.day).distinct.length === dayRows.length,
        "each day must finalize exactly once")
      // The documented carry fold: absolute peak = intraday peak + sum of
      // all prior days' net deltas.
      var carry = 0L
      val streamed = dayRows.sortBy(_.day).map { p =>
        val abs = p.peak_intraday + carry
        carry += p.day_net
        p.day -> abs
      }.toMap
      assert(streamed == batch,
        s"only-stream=${streamed.toSet -- batch.toSet} " +
          s"only-batch=${batch.toSet -- streamed.toSet}")
    } finally q.stop()
  }

  test("sessions longer than the watermark delay keep their start delta") {
    implicit val sqlCtx = spark.sqlContext
    // Day D (2024-03-01 UTC). One 4h50m session (far over the 1 h
    // watermark) overlapping one 10-min session: correct peak is 2.
    // Fed in CLOSURE order (short ends first), the long session's +1 at
    // 00:10 sits ~4 h behind the short session's end — a start-time
    // watermark stamp would drop it and report peak 1 / day_net +1.
    val d0 = java.time.LocalDate.parse("2024-03-01").toEpochDay * 86400000L
    def s(stMin: Long, enMin: Long, uid: Long) =
      SessionOut(uid, new Timestamp(d0 + stMin * 60000),
        new Timestamp(d0 + enMin * 60000), 1L, 0.0)
    val longS = s(10, 290, 1L)   // 00:10 – 04:50
    val shortS = s(240, 250, 2L) // 04:00 – 04:10

    val in = MemoryStream[SessionOut]
    val q = StreamingPipelines.peakConcurrency(in.toDS())
      .writeStream.format("memory").queryName("conc_long_session")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(shortS); q.processAllAvailable()
      in.addData(longS); q.processAllAvailable()
      val far = d0 + 40L * 24 * 3600 * 1000
      in.addData(s(far / 60000 - d0 / 60000, far / 60000 - d0 / 60000, -1L))
      q.processAllAvailable()
      in.addData(s(far / 60000 - d0 / 60000 + 1, far / 60000 - d0 / 60000 + 1, -1L))
      q.processAllAvailable()
      val rows = spark.table("conc_long_session").as[DayPeak].collect()
        .filter(_.day == "2024-03-01")
      assert(rows.length === 1)
      assert(rows.head.peak_intraday === 2L,
        "the long session's start delta must survive the watermark")
      assert(rows.head.day_net === 0L)
    } finally q.stop()
  }
}
