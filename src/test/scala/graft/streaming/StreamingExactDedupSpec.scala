package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.StreamingLearn.DocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The watermark-bounded exact-dedup contract: duplicates inside the
  * delay window are suppressed (first arrival wins), and a copy
  * arriving after its fingerprint's state expired is re-admitted —
  * the price of bounded state, stated as a test instead of a hope.
  */
class StreamingExactDedupSpec extends SparkSpec {

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("within-window duplicates collapse to the first arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocEvent]
    val query = StreamingExactDedup.dedupedStream(input.toDS())
      .writeStream.format("memory").queryName("exact_dedup_1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        DocEvent(1L, "alpha beta gamma", ts(0)),
        DocEvent(2L, "alpha beta gamma", ts(1)), // same batch dup
        DocEvent(3L, "delta epsilon", ts(0)))
      query.processAllAvailable()
      input.addData(DocEvent(4L, "alpha beta gamma", ts(2))) // next-batch dup
      query.processAllAvailable()
      val got = spark.table("exact_dedup_1")
        .select("docId").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 3L), s"expected first arrivals only, got $got")
    } finally query.stop()
  }

  test("a copy arriving after state expiry is re-admitted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocEvent]
    val query = StreamingExactDedup.dedupedStream(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("exact_dedup_2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(DocEvent(1L, "zeta eta theta", ts(0)))
      query.processAllAvailable()
      // Advance the watermark far past ts(0) + delay so the state row
      // for the fingerprint is evicted...
      input.addData(DocEvent(99L, "watermark mover", ts(120)))
      query.processAllAvailable()
      // ...then the same text arrives again, after the window.
      input.addData(DocEvent(2L, "zeta eta theta", ts(121)))
      query.processAllAvailable()
      val got = spark.table("exact_dedup_2")
        .select("docId").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 99L, 2L),
        s"post-expiry copy should re-admit (bounded-state contract), got $got")
    } finally query.stop()
  }
}
