package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.StreamingLearn._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingLearnSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed outcome stats aggregate per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[OutcomeEvent]
    val query = runToMemorySink(input.toDS(), "win_stats")
    try {
      input.addData(
        OutcomeEvent("a", "deploy", success = true, ts("2024-01-01 10:05:00")),
        OutcomeEvent("a", "deploy", success = false, ts("2024-01-01 10:20:00")),
        OutcomeEvent("a", "ingest", success = true, ts("2024-01-01 11:10:00")))
      query.processAllAvailable()
      val rows = spark.table("win_stats")
        .select("taskType", "n", "n_success", "success_ratio")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(("deploy", 2L, 1L, 0.5), ("ingest", 1L, 1L, 1.0)))
    } finally query.stop()
  }

  test("promotion state machine flips once thresholds pass and persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[OutcomeEvent]
    val query = promotionState(input.toDS()).writeStream
      .format("memory").queryName("promo").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        OutcomeEvent("a", "t", success = true, ts("2024-01-01 10:00:00")),
        OutcomeEvent("a", "t", success = true, ts("2024-01-01 10:01:00")))
      query.processAllAvailable()
      val afterTwo = spark.table("promo").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3))).head
      assert(afterTwo == ("a", 2L, false))

      input.addData(OutcomeEvent("a", "t", success = true, ts("2024-01-01 10:02:00")))
      query.processAllAvailable()
      val afterThree = spark.table("promo").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
        .maxBy(_._2)
      assert(afterThree == ("a", 3L, true))
    } finally query.stop()
  }

  test("foreachBatch incremental learn promotes once history crosses thresholds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-learn").toString
    val input = MemoryStream[OutcomeEvent]
    val emitter = new graft.events.EventEmitter
    var formed = List.empty[graft.events.MemoryEvent]
    emitter.subscribe(graft.events.MemoryEventType.HeuristicFormed)(e => formed ::= e)
    val query = runIncrementalLearn(input.toDS(), s"$dir/outcomes", s"$dir/promotions",
      s"$dir/ckpt", emitter = Some(emitter))
    try {
      input.addData(
        OutcomeEvent("a", "deploy", success = true, ts("2024-01-01 10:00:00")),
        OutcomeEvent("a", "deploy", success = true, ts("2024-01-01 10:01:00")))
      query.processAllAvailable()
      assert(spark.read.parquet(s"$dir/promotions").count() == 0)
      assert(formed.isEmpty)

      input.addData(OutcomeEvent("a", "deploy", success = true, ts("2024-01-01 10:02:00")))
      query.processAllAvailable()
      val promoted = spark.read.parquet(s"$dir/promotions").collect()
      assert(promoted.length == 1)
      val r = promoted.head
      assert(r.getAs[String]("agent") == "a" && r.getAs[Long]("n") == 3L)
      assert(r.getAs[Double]("confidence") == 1.0)
      // The optional foreachBatch hook surfaced the promotion as a
      // control-plane event.
      assert(formed.map(e => (e.agent, e.payload("confidence"))) == List(("a", "1.0")))
    } finally query.stop()
  }

  test("streaming dedup keeps one row per content fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocEvent]
    val query = dedupDocuments(input.toDS()).writeStream
      .format("memory").queryName("dedup_docs").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        DocEvent(1L, "the same document", ts("2024-01-01 10:00:00")),
        DocEvent(2L, "the same document", ts("2024-01-01 10:01:00")),
        DocEvent(3L, "a different document", ts("2024-01-01 10:02:00")))
      query.processAllAvailable()
      // A later-batch duplicate inside the lateness horizon also drops.
      input.addData(DocEvent(4L, "the same document", ts("2024-01-01 10:03:00")))
      query.processAllAvailable()
      val kept = spark.table("dedup_docs").collect().map(_.getAs[Long]("docId")).toSet
      assert(kept == Set(1L, 3L), s"got $kept")
    } finally query.stop()
  }
}
