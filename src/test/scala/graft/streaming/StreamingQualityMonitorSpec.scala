package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.io.Tables
import graft.streaming.StreamingLearn.DocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming corpus-health roll-up must equal the batch twin on
  * the same documents — same windows, same counts, same rounded
  * quality means — even when the stream delivers the corpus out of
  * order across micro-batches.
  */
class StreamingQualityMonitorSpec extends SparkSpec {

  private val BaseMs = 1700000000000L

  test("windowed quality roll-ups equal the batch twin on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => DocEvent(r.getLong(0), r.getString(1),
        new Timestamp(BaseMs + r.getLong(0) * 60000L)))

    val input = MemoryStream[DocEvent]
    val query = StreamingQualityMonitor.windowedQuality(input.toDS())
      .writeStream.format("memory").queryName("quality_mon")
      .outputMode(OutputMode.Append()).start()
    try {
      // Two chunks split on the time axis (batch 2 must not fall
      // behind batch 1's watermark — late rows would be DROPPED, which
      // is watermark semantics, not a parity bug); rows WITHIN each
      // chunk arrive in arbitrary collect order, which is the
      // out-of-orderness the window aggregate actually absorbs. A
      // far-future sentinel then closes every real window (append
      // emits on watermark pass).
      val (early, late) = docs.sortBy(_.docId).splitAt(docs.length / 2)
      input.addData(early.toSeq)
      query.processAllAvailable()
      input.addData(late.toSeq)
      query.processAllAvailable()
      val sentinelMs = BaseMs + 1000L * 60000L
      input.addData(DocEvent(-1L, "sentinel text", new Timestamp(sentinelMs)))
      query.processAllAvailable()

      val got = spark.table("quality_mon")
        .filter(col("win_start_us") < sentinelMs * 1000L)
        .collect().map(_.toSeq).toSet
      val batchDf = Tables.documents(spark, Sf)
        .select(col("text"),
          expr(s"timestamp_micros(cast(($BaseMs + doc_id * 60000) * 1000 as bigint))").as("ts"))
      val want = StreamingQualityMonitor.batchQuality(batchDf)
        .collect().map(_.toSeq).toSet
      assert(got == want,
        s"streaming windows differ from batch twin: ${got.size} vs ${want.size} rows")
      assert(got.size > 1, "degenerate: everything landed in one window")
    } finally query.stop()
  }
}
