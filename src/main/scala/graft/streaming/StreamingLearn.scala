package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingestion + incremental learning — the Structured Streaming
  * expression of the reference's write-triggered incremental maintenance
  * (reference: alma/learning/protocols.py:141-159 — every outcome write
  * re-evaluates promotion over the affected groups;
  * alma/learning/forgetting.py:1239-1470 background jobs). The
  * reference polls on a scheduler thread; here the same aggregates run
  * continuously with watermarked event-time windows and typed
  * mapGroupsWithState.
  */
object StreamingLearn {

  /** One outcome event on the stream. */
  final case class OutcomeEvent(
      agent: String,
      taskType: String,
      success: Boolean,
      ts: Timestamp)

  /** Windowed success-ratio aggregation: per (taskType, 1h event-time
    * window), counts + success ratio, tolerating 10 minutes of
    * lateness. The streaming analog of the A1 promotion scan.
    */
  def windowedOutcomeStats(events: Dataset[OutcomeEvent]): DataFrame =
    events.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("taskType"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("success"), 1L).otherwise(0L)).as("n_success"))
      .select(
        col("window.start").as("window_start"),
        col("taskType"), col("n"), col("n_success"),
        (col("n_success").cast("double") / col("n")).as("success_ratio"))

  /** Running per-agent promotion state (occurrences, successes, promoted
    * flag once thresholds pass) via typed mapGroupsWithState — the
    * streaming form of the occurrence-increment + promotion check (A3 +
    * A1).
    */
  final case class AgentState(occurrences: Long, successes: Long, promoted: Boolean)
  final case class AgentUpdate(agent: String, occurrences: Long, successes: Long, promoted: Boolean)

  def promotionState(events: Dataset[OutcomeEvent]): Dataset[AgentUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.agent)
      .mapGroupsWithState[AgentState, AgentUpdate](GroupStateTimeout.NoTimeout()) {
        (agent: String, batch: Iterator[OutcomeEvent], state: GroupState[AgentState]) =>
          val prev = state.getOption.getOrElse(AgentState(0L, 0L, promoted = false))
          val evs = batch.toSeq
          val occ = prev.occurrences + evs.size
          val succ = prev.successes + evs.count(_.success)
          val promoted = prev.promoted ||
            (occ >= 3 && succ.toDouble / occ > 0.5)
          state.update(AgentState(occ, succ, promoted))
          AgentUpdate(agent, occ, succ, promoted)
      }
  }

  /** One ingested document on the stream (the streaming ingest shape of
    * the training-data pipeline).
    */
  final case class DocEvent(docId: Long, text: String, ts: Timestamp)

  /** Streaming exact dedup by content fingerprint — the streaming form
    * of the batch exact-dedup pass (Dedup, `q_dedup_exact`). State is
    * BOUNDED: `dropDuplicatesWithinWatermark` evicts fingerprints once
    * the watermark passes them, so dedup state tracks the lateness
    * horizon, not the corpus — the property that keeps this runnable
    * against an unbounded 100 TB ingest firehose.
    */
  def dedupDocuments(docs: Dataset[DocEvent], lateness: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Wire a streaming source through the windowed aggregation to an
    * in-memory sink (used by tests and as the deployment template: swap
    * the source for kafka/files and the sink for a Parquet/foreachBatch
    * writer).
    */
  def runToMemorySink(events: Dataset[OutcomeEvent], queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedOutcomeStats(events).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()

  /** foreachBatch maintenance: each micro-batch appends raw outcomes to
    * a Parquet log and re-runs the promotion aggregation over the full
    * accumulated history into a promotions snapshot — the streaming
    * form of the reference's write-triggered incremental learn
    * (protocols.py:141-159: every write re-evaluates the affected
    * groups) and its background-scheduler jobs (forgetting.py:1239-1470).
    */
  def runIncrementalLearn(
      events: Dataset[OutcomeEvent],
      outcomesPath: String,
      promotionsPath: String,
      checkpointPath: String,
      emitter: Option[graft.events.EventEmitter] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[OutcomeEvent], batchId: Long) =>
        // Idempotent on replay: each batch overwrites its own partition
        // directory, so a restarted query re-writing batch N cannot
        // double-append history.
        batch.write.mode("overwrite").parquet(s"$outcomesPath/batch_id=$batchId")
        val spark = batch.sparkSession
        val promoted = spark.read.parquet(outcomesPath)
          .groupBy("agent", "taskType")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("success"), 1L).otherwise(0L)).as("n_success"))
          .withColumn("confidence", col("n_success").cast("double") / col("n"))
          .filter(col("n") >= 3 && col("confidence") > 0.5)
        promoted.write.mode("overwrite").parquet(promotionsPath)
        // Optional event hook (reference alma/events/ wired through
        // foreachBatch, SURVEY's optional-sink mapping): control-plane
        // notifications only — one batch summary plus the promoted
        // aggregate rows, which are bounded by the (agent, taskType)
        // key space, CAPPED at 100 per batch so a wide key space can
        // never turn the driver callback into the data plane (the
        // promotions snapshot itself is the complete record).
        emitter.foreach { em =>
          em.emit(graft.events.MemoryEvent(
            graft.events.MemoryEventType.Created, "stream", "stream",
            "outcomes", s"batch-$batchId", batchId, Map.empty))
          promoted.select("agent", "taskType", "confidence").limit(100)
            .collect().foreach { r =>
              em.emit(graft.events.MemoryEvent(
                graft.events.MemoryEventType.HeuristicFormed,
                r.getString(0), "stream", "heuristics",
                s"${r.getString(0)}-${r.getString(1)}", batchId,
                Map("confidence" -> r.getDouble(2).toString)))
            }
        }
      }
      .start()
  }
}
