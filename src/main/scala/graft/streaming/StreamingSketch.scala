package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.Sketches
import graft.streaming.StreamingLearn.DocEvent

/** Streaming Count-Min sketch maintenance — the continuous-ingest form
  * of `q_cms_topk`'s build side, and the merge law (`Wave5Spec` pins
  * shard-merge == single-pass) exercised as an ACTUAL streaming
  * pipeline: each micro-batch folds its documents into a bounded
  * (j, bucket, cell) partial — d·w = 2048 cells no matter the batch —
  * and appends it as its own batch_id partition of a Parquet-persisted
  * sketch. Sketch state therefore lives in storage, never in executor
  * memory or the state store; reads merge the partials by cell-wise
  * sum, which is associative, so compaction (folding old partitions
  * into one) is a pure background optimization that cannot change any
  * estimate.
  *
  * Replay-idempotent the same way StreamingDedup's index is: a
  * restarted batch OVERWRITES its own batch_id partition, so re-fired
  * micro-batches cannot double-count.
  */
object StreamingSketch {

  /** The micro-batch partial: one bounded aggregate, the same cell
    * formula the batch query and its DuckDB oracle share.
    */
  def batchCells(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(explode(sequence(lit(0), lit(Sketches.CmsDepth - 1))).as("j"),
        col("tok"))
      .groupBy(col("j"), Sketches.cmsBucket(col("j"), col("tok")).as("bucket"))
      .agg(count(lit(1)).as("cell"))

  /** Run the maintenance loop over a document stream. */
  def runSketch(docs: Dataset[DocEvent], sketchPath: String,
      checkpointPath: String): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[DocEvent], batchId: Long) =>
        processBatch(batch.toDF(), batchId, sketchPath)
      }
      .start()

  /** One micro-batch, exposed for replay testing and batch backfill. */
  def processBatch(batch: DataFrame, batchId: Long, sketchPath: String): Unit =
    batchCells(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(sketchPath)

  /** The merged sketch: cell-wise sum over all persisted partials. */
  def readSketch(spark: SparkSession, sketchPath: String): DataFrame =
    spark.read.parquet(sketchPath)
      .groupBy("j", "bucket").agg(sum("cell").as("cell"))

  /** Point estimate for a token against the merged sketch: min over the
    * d probed cells (a missing cell means the token was never seen —
    * estimate 0).
    */
  def estimate(spark: SparkSession, sketchPath: String, token: String): Long = {
    import spark.implicits._
    val probes = (0 until Sketches.CmsDepth).toDF("j")
      .select(col("j"), Sketches.cmsBucket(col("j"), lit(token)).as("bucket"))
    readSketch(spark, sketchPath)
      .join(probes, Seq("j", "bucket"))
      .agg(coalesce(min("cell"), lit(0L)))
      .head().getLong(0)
  }

  // ---- HyperLogLog registers (the max-merge sibling) ------------------

  /** Per-batch HLL register partial: (reg, rank), ≤ m = 256 rows —
    * the same register formula as `q_hll_cardinality` (corpus-wide,
    * not per-source: the streaming form tracks total distinct tokens).
    */
  def hllBatchRegisters(docs: DataFrame): DataFrame = {
    val h = graft.operators.TextAnalysisShared.hash64(col("tok"))
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(pmod(h, lit(Sketches.HllM.toLong)).as("reg"))
      .agg(max(Sketches.hllRho(shiftright(h, Sketches.HllP))).as("rank"))
  }

  /** One HLL micro-batch (append partial; replay overwrites). */
  def processHllBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    hllBatchRegisters(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Merged registers: rank-wise MAX over partials (the HLL merge law). */
  def readHllRegisters(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).groupBy("reg").agg(max("rank").as("rank"))

  /** Cardinality estimate from the merged registers — the identical
    * estimator expression the batch query pins against DuckDB.
    */
  def hllEstimate(spark: SparkSession, path: String): Double = {
    val m = Sketches.HllM.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val row = readHllRegisters(spark, path)
      .agg((sum(pow(lit(2.0), -col("rank"))) + (lit(m) - count(lit(1)))).as("harm"),
        (lit(Sketches.HllM) - count(lit(1))).cast("long").as("zeros"))
      .head()
    val (harm, zeros) = (row.getDouble(0), row.getLong(1))
    val raw = alpha * m * m / harm
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  /** Compact every persisted partial into one partition. Because the
    * merge is cell-wise sum (associative + commutative), compaction
    * CANNOT change any estimate — spec-asserted — it only bounds the
    * number of partials a read has to fold. The compacted state is
    * written as a fresh batch_id = −(n_partials) partition via an
    * overwrite of the whole path, so a crash between write and the
    * next read leaves either the old partials or the compacted form,
    * both of which merge to the same cells.
    */
  def compact(spark: SparkSession, sketchPath: String): Unit = {
    val merged = readSketch(spark, sketchPath)
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint(true) // materialize BEFORE overwriting the input path
    merged.write.mode("overwrite").partitionBy("batch_id").parquet(sketchPath)
  }
}
