package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization + distribution statistics over the event stream —
  * batch session assignment (gap-based: a >30-minute silence starts a
  * new session) expressed as two window passes: flag gap starts with
  * lag(), then a running sum of flags is the session index. This is the
  * standard scale-safe formulation (one shuffle by user, one sort) used
  * to build session-level training examples from event logs.
  */
object Sessionize {

  private val GapMinutes = 30

  private def sessionized(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(running))
  }

  // Session roll-up: per (user, session) bounds, size, and value stats.
  private def sessionStats(s: SparkSession, dir: String): DataFrame =
    sessionized(s, dir)
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        round(sum("value"), 2).as("session_value"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "session_idx")

  private val sessionStatsSql =
    s"""WITH e AS (SELECT event_id, user_id, value, ts::TIMESTAMP AS ts FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL
       |                   OR epoch_us(ts) - prev_us > ${GapMinutes * 60L * 1000000L} THEN 1 ELSE 0 END AS new_session
       |  FROM (
       |    SELECT *, lag(epoch_us(ts), 1) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |    FROM e) t),
       |sess AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx, count(*)::BIGINT AS n_events,
       |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
       |  round(sum(value), 2) AS session_value,
       |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
       |FROM sess GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // Exact distribution statistics per event type (median is exact at
  // this grouping granularity in both engines).
  private def valueQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(median(col("value")), 4).as("median_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(stddev_pop(col("value")), 4).as("stddev_value"))
      .orderBy("event_type")

  private val valueQuantilesSql =
    """SELECT event_type,
      |  round(median(value), 4) AS median_value,
      |  min(value) AS min_value,
      |  max(value) AS max_value,
      |  round(stddev_pop(value), 4) AS stddev_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_sessionize", sessionStats, Some(sessionStatsSql)),
    Q("q_value_quantiles", valueQuantiles, Some(valueQuantilesSql)))
}
