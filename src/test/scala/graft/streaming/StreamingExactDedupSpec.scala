package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.StreamingLearn.DocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The bounded-state flip side of `StreamingLearn.dedupDocuments`'s
  * watermark-bounded exact dedup: suppression-within-the-window is
  * already pinned by StreamingLearnSpec; this spec pins what bounded
  * state COSTS — a copy arriving after its fingerprint's state row
  * expired is re-admitted. Long-range exactness is the batch layer's
  * job (`q_dedup_exact` over the accumulated corpus, or
  * `StreamingDedup`'s Parquet-backed index, whose state lives in
  * storage precisely so it CAN be unbounded).
  */
class StreamingExactDedupSpec extends SparkSpec {

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("a copy arriving after state expiry is re-admitted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocEvent]
    val query = StreamingLearn.dedupDocuments(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("exact_dedup_expiry")
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
      val got = spark.table("exact_dedup_expiry")
        .select("docId").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 99L, 2L),
        s"post-expiry copy should re-admit (bounded-state contract), got $got")
    } finally query.stop()
  }
}
