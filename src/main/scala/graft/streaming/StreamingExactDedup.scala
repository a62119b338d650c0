package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingLearn.DocEvent

/** Exact-duplicate suppression on a continuous ingest, using Spark's
  * native `dropDuplicatesWithinWatermark` operator — the streaming twin
  * of `q_dedup_exact` the way `StreamingDedup` is the streaming twin of
  * the MinHash near-dup family.
  *
  * Why the *WithinWatermark* form and not plain `dropDuplicates`: exact
  * streaming dedup must keep one state row per fingerprint ever seen,
  * which on an unbounded 100 TB ingest grows without limit and
  * eventually evicts or OOMs every state store. The watermark form
  * bounds state by TIME instead: a fingerprint's row is dropped once
  * the watermark passes its expiry, so state size tracks the ingest
  * rate × delay window — a constant for a steady stream — not the
  * stream's history. The contract is correspondingly scoped: a
  * duplicate is suppressed when it arrives within the watermark delay
  * of the retained copy; a copy arriving after the state expired is
  * re-admitted (pinned by StreamingExactDedupSpec). Long-range exact
  * dedup belongs to the batch layer (`q_dedup_exact` over the
  * accumulated corpus, or `StreamingDedup`'s Parquet-backed index,
  * whose state lives in storage precisely so it CAN be unbounded).
  *
  * The fingerprint is the same md5-of-text used by `q_dedup_exact` and
  * the corpus card, so the streaming and batch layers agree on what
  * "exact duplicate" means.
  */
object StreamingExactDedup {

  /** First-arrival-wins exact dedup over a document stream. Append
    * mode; each surviving document is emitted exactly once, as soon as
    * its micro-batch processes (the state row exists only to suppress
    * later copies — emission never waits on the watermark).
    */
  def dedupedStream(docs: Dataset[DocEvent], delay: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
}
