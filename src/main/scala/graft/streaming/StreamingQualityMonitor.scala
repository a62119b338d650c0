package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingLearn.DocEvent

/** Streaming corpus-health monitor: per event-time window, the
  * quality profile of arriving documents — document count, mean
  * quality score, short-document fraction, mean token count. The live
  * counterpart of the batch health passes (`q_quality_score`,
  * `q_corpus_card`, `q_source_divergence`): a feed that silently
  * degrades (a crawler starts emitting boilerplate, a source flips
  * language) shows up as a windowed quality/short-fraction shift
  * while the ingest is still running, not at the next nightly batch.
  *
  * Scale shape: a pure projection (the shared per-doc quality column,
  * `TextAnalysis.qualityCol` — same number as the batch query by
  * construction) into a watermarked tumbling-window aggregate. State
  * is one partial aggregate per open window — bounded by the
  * watermark horizon, independent of ingest volume; every aggregate
  * is map-side combinable, so the exchange carries one partial row
  * per (window, partition).
  *
  * The batch twin ([[batchQuality]]) runs the IDENTICAL projection +
  * roll-up on a static frame; StreamingQualityMonitorSpec pins
  * set-parity between the two on the same documents.
  */
object StreamingQualityMonitor {

  private val ShortDocTokens = 20

  private def projected(df: DataFrame): DataFrame =
    df.select(col("ts"),
      graft.operators.TextAnalysis.qualityCol(col("text")).as("q"),
      size(split(col("text"), " ")).cast("double").as("n_toks"))

  private def rollup(df: DataFrame, win: String): DataFrame =
    df.groupBy(window(col("ts"), win))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("q"), 4).as("avg_quality"),
        sum(when(col("n_toks") < ShortDocTokens, 1L).otherwise(0L)).as("short_docs"),
        round(avg("n_toks"), 4).as("avg_tokens"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n_docs"), col("avg_quality"), col("short_docs"), col("avg_tokens"))

  /** Watermarked streaming roll-up (append mode: each window emits
    * exactly once, when the watermark passes its end).
    */
  def windowedQuality(
      docs: Dataset[DocEvent],
      win: String = "10 minutes",
      lateness: String = "5 minutes"): DataFrame =
    rollup(projected(docs.toDF()).withWatermark("ts", lateness), win)

  /** The batch twin over any static (ts, text) frame — identical
    * projection and roll-up, no watermark.
    */
  def batchQuality(df: DataFrame, win: String = "10 minutes"): DataFrame =
    rollup(projected(df), win)
}
