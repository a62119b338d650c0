package graft.operators

import graft.Q
import graft.io.Tables
import graft.observability.Metrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle contract for the observability roll-up
  * ([[graft.observability.Metrics.rollup]], reference:
  * alma/observability/metrics.py:125-175 get_histogram_stats /
  * get_counter): the live listener's records aren't visible to the
  * DuckDB gate, so `q_op_metrics` drives the SAME rollup function over
  * an op log synthesized deterministically from `events` — the oracle
  * hash-checks the aggregation, and `ObservabilitySpec` pins the
  * listener → flush → rollup path end-to-end over real query
  * executions.
  */
object OpsMetrics {

  /** Synthetic per-call op log: op = event_type, ~1/29 calls error,
    * deterministic wall/rows/shuffle magnitudes. `rows` is -1 on error
    * records, matching the sink's "plan exposed no row count" marker.
    */
  private[operators] def opLog(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_type").as("op"),
      when(col("event_id") % 29 === 0, lit("error")).otherwise(lit("ok")).as("status"),
      ((col("event_id") * 17) % 900 + 1).as("wall_ms"),
      when(col("event_id") % 29 === 0, lit(-1L))
        .otherwise((col("event_id") * 7) % 1000).as("rows"),
      ((col("event_id") * 1021) % 100000).as("shuffle_bytes"))

  private def opMetrics(s: SparkSession, dir: String): DataFrame =
    Metrics.rollup(opLog(s, dir))

  private val opMetricsSql =
    """WITH log AS (
      |  SELECT event_type AS op,
      |    CASE WHEN event_id % 29 = 0 THEN 'error' ELSE 'ok' END AS status,
      |    (event_id * 17) % 900 + 1 AS wall_ms,
      |    CASE WHEN event_id % 29 = 0 THEN -1 ELSE (event_id * 7) % 1000 END AS rows,
      |    (event_id * 1021) % 100000 AS shuffle_bytes
      |  FROM events)
      |SELECT op, count(*)::BIGINT AS calls,
      |  sum((status = 'ok')::INT)::BIGINT AS ok_calls,
      |  sum((status <> 'ok')::INT)::BIGINT AS err_calls,
      |  sum(wall_ms)::BIGINT AS total_wall_ms,
      |  round(avg(wall_ms), 6) AS avg_wall_ms,
      |  round(median(wall_ms), 6) AS p50_wall_ms,
      |  max(wall_ms)::BIGINT AS max_wall_ms,
      |  sum(CASE WHEN rows > 0 THEN rows ELSE 0 END)::BIGINT AS total_rows,
      |  sum(shuffle_bytes)::BIGINT AS total_shuffle_bytes
      |FROM log GROUP BY op ORDER BY op""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_op_metrics", opMetrics, Some(opMetricsSql)))
}
