package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Parity of the native session_window streaming sessionization with
  * the batch two-window-pass form, on the real events corpus.
  */
final case class SessEv(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

class StreamingSessionizeSpec extends SparkSpec {

  test("streaming session_window roll-ups equal the batch q_sessionize roll-ups") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessEv]
    val query = StreamingSessionize.sessionStats(input.toDF())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = graft.io.Tables.events(spark, Sf)
        .select("event_id", "ts", "user_id", "value").as[SessEv].collect()
      input.addData(evs.toSeq)
      query.processAllAvailable()
      // Sessions only leave the state store once the watermark passes
      // their end: one far-future sentinel per user closes every real
      // session (append mode emits each exactly once).
      val maxMs = evs.map(_.ts.getTime).max
      val sentinelMs = maxMs + 10L * 24 * 3600 * 1000
      input.addData(evs.map(_.user_id).distinct.toSeq
        .map(u => SessEv(-1L, new Timestamp(sentinelMs), u, 0.0)))
      query.processAllAvailable()

      // The two forms differ ONLY on a same-user gap of EXACTLY the
      // threshold (batch merges on <=, session_window splits on <);
      // exclude any user exhibiting that boundary so the parity
      // assertion survives corpus regenerations at coarser timestamp
      // granularity instead of depending on micros luck.
      val gapUs = 30L * 60 * 1000000
      val order = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val boundaryUsers = graft.io.Tables.events(spark, Sf)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
        .filter(unix_micros(col("ts")) - col("prev_us") === gapUs)
        .select("user_id").distinct().collect().map(_.getLong(0)).toSet
      val keep = !col("user_id").isin(boundaryUsers.toSeq: _*)
      val got = spark.table("sess_stream")
        .filter(col("start_us") < sentinelMs * 1000L) // drop sentinel sessions
        .filter(keep)
        .select("user_id", "start_us", "end_us", "n_events", "session_value")
      val want = SparkEntry.queries("q_sessionize")(spark, Sf)
        .filter(keep)
        .select("user_id", "start_us", "end_us", "n_events", "session_value")
      assert(got.count() == want.count(),
        s"session count mismatch: streaming ${got.count()} vs batch ${want.count()}")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "streaming and batch session roll-ups differ")
    } finally query.stop()
  }

  test("a gap longer than the threshold splits; a shorter one merges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessEv]
    val query = StreamingSessionize.sessionStats(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_gap")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(
        SessEv(1, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, 1.0),
        SessEv(2, Timestamp.valueOf("2024-01-01 10:20:00"), 7L, 2.0), // merges
        SessEv(3, Timestamp.valueOf("2024-01-01 11:30:00"), 7L, 4.0), // splits
        SessEv(4, Timestamp.valueOf("2024-02-01 00:00:00"), 7L, 0.0))) // closes both
      query.processAllAvailable()
      val sessions = spark.table("sess_gap")
        .filter(col("start_us") < Timestamp.valueOf("2024-02-01 00:00:00").getTime * 1000L)
        .select("n_events", "session_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(sessions == Set((2L, 3.0), (1L, 4.0)), s"got $sessions")
    } finally query.stop()
  }
}
