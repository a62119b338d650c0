package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.io.Tables
import graft.streaming.StreamingLearn.DocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed sketch must be indistinguishable from the one-pass
  * batch sketch over the same corpus — the merge law in motion — and a
  * replayed micro-batch must not double-count.
  */
class StreamingSketchSpec extends SparkSpec {

  private val BaseMs = 1700000000000L

  private def corpusEvents() =
    Tables.documents(spark, Sf).select(col("doc_id"), col("text")).collect()
      .map(r => DocEvent(r.getLong(0), r.getString(1),
        new Timestamp(BaseMs + r.getLong(0))))

  private def cellMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket")) ->
      r.getAs[Long]("cell")).toMap

  test("streamed micro-batch partials merge to the single-pass batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_sketch").toString
    val docs = corpusEvents()
    val input = MemoryStream[DocEvent]
    val query = StreamingSketch.runSketch(input.toDS(),
      s"$dir/sketch", s"$dir/ckpt")
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a.toSeq)
      query.processAllAvailable()
      input.addData(b.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    val batch = cellMap(StreamingSketch.batchCells(
      Tables.documents(spark, Sf).select(col("text"))))
    assert(streamed == batch,
      "streamed sketch cells diverge from the one-pass batch sketch")
  }

  test("replayed batch overwrites its partition — no double counting") {
    val dir = java.nio.file.Files.createTempDirectory("stream_sketch_rp").toString
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    StreamingSketch.processBatch(docs, batchId = 0L, s"$dir/sketch")
    val once = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    // Restart semantics: the same batch id fires again with the same data.
    StreamingSketch.processBatch(docs, batchId = 0L, s"$dir/sketch")
    val twice = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    assert(once == twice, "replay doubled the sketch cells")
    // A genuinely new batch DOES add.
    StreamingSketch.processBatch(docs, batchId = 1L, s"$dir/sketch")
    val added = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    assert(added.values.sum == 2 * once.values.sum)
  }

  test("compaction folds partials without changing a single cell") {
    val dir = java.nio.file.Files.createTempDirectory("stream_sketch_cp").toString
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    StreamingSketch.processBatch(a, batchId = 0L, s"$dir/sketch")
    StreamingSketch.processBatch(b, batchId = 1L, s"$dir/sketch")
    val before = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    StreamingSketch.compact(spark, s"$dir/sketch")
    val after = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    assert(before == after, "compaction changed sketch cells")
    // And the compacted state keeps accepting new batches.
    StreamingSketch.processBatch(a, batchId = 2L, s"$dir/sketch")
    val grown = cellMap(StreamingSketch.readSketch(spark, s"$dir/sketch"))
    assert(grown.values.sum == before.values.sum +
      cellMap(StreamingSketch.batchCells(a)).values.sum)
  }

  test("streamed HLL registers merge to the batch registers; estimate tracks exact") {
    val dir = java.nio.file.Files.createTempDirectory("stream_hll").toString
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    StreamingSketch.processHllBatch(a, batchId = 0L, s"$dir/hll")
    StreamingSketch.processHllBatch(b, batchId = 1L, s"$dir/hll")
    val merged = StreamingSketch.readHllRegisters(spark, s"$dir/hll")
      .collect().map(r => r.getAs[Long]("reg") -> r.getAs[Int]("rank")).toMap
    val single = StreamingSketch.hllBatchRegisters(docs)
      .collect().map(r => r.getAs[Long]("reg") -> r.getAs[Int]("rank")).toMap
    assert(merged == single, "max-merged shard registers diverge from one pass")
    val est = StreamingSketch.hllEstimate(spark, s"$dir/hll")
    val exact = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct("t")).head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact <= 0.15,
      s"HLL estimate $est vs exact $exact")
  }

  test("estimate never underestimates a probed token") {
    val dir = java.nio.file.Files.createTempDirectory("stream_sketch_est").toString
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    StreamingSketch.processBatch(docs, batchId = 0L, s"$dir/sketch")
    val tok = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .head()
    val est = StreamingSketch.estimate(spark, s"$dir/sketch", tok.getString(0))
    assert(est >= tok.getLong(1), s"CMS underestimated: $est < ${tok.getLong(1)}")
    assert(StreamingSketch.estimate(spark, s"$dir/sketch",
      "tok-never-in-corpus-xyzzy") >= 0L)
  }
}
