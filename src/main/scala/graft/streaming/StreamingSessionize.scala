package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization as a NATIVE Structured Streaming
  * aggregation: `session_window(ts, gap)` merges events into dynamic
  * per-key windows that extend while events keep arriving within the
  * gap — the streaming form of the batch `q_sessionize` two-window-pass
  * formulation, with state bounded by the watermark instead of a
  * partition-wide sort.
  *
  * Semantics vs batch: the batch rule keeps two events in one session
  * when `ts - prev_ts <= gap`; session windows merge when
  * `ts - prev_ts < gap` (the window is the half-open [ts, ts+gap)).
  * The conventions differ only when a gap equals the threshold
  * EXACTLY, at microsecond resolution — `StreamingSessionizeSpec`
  * proves set-parity of the session roll-ups on the events corpus.
  *
  * Scale shape: state is per (user, open-session) and sessions close —
  * and leave the state store — once the watermark passes their end, so
  * a continuous 100 TB event stream holds state proportional to
  * concurrently-open sessions, never to history. The batch form's
  * per-user sort over all history has no such bound.
  */
object StreamingSessionize {

  /** Per-(user, session) roll-up: bounds, size, value sum. Same output
    * grain as the batch `q_sessionize` aggregate, keyed by the session
    * window instead of a running session index.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        round(sum("value"), 2).as("session_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("window_start"),
        col("n_events"), col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"),
        col("session_value"))
}
