package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic analytical shapes over the star schema — multi-join
  * aggregation pipelines (TPC-H Q3/Q5 style) and the windowed analytics
  * family (lag/lead/moving average) — exercising join reordering,
  * broadcast of the dimension chain, and frame-based windows.
  */
object Analytics {

  // Q3-shaped shipping priority: 3-way join, filter both sides of the
  // date, group, top-10 by revenue.
  private def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-01-01"))
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    // No broadcast hint: the filtered customer side scales with the
    // data volume (unlike a true bounded dimension) — AQE picks
    // broadcast at small SF and hash join once it would not fit.
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val shippingPrioritySql =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // Q5-shaped local-supplier revenue: the full dimension chain
  // region → nation → supplier broadcast into the fact table.
  private def nationRevenue(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("s_suppkey", "n_name")
    // Supplier scales with SF; no forced broadcast (AQE decides).
    Tables.lineitem(s, dir)
      .join(dims, col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val nationRevenueSql =
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*)::BIGINT AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // §2.7 frame windows: lag/lead deltas + centered moving average of
  // each user's event values in time order.
  private def windowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val frame = order.rowsBetween(-2, 2)
    Tables.events(s, dir)
      .select(
        col("event_id"), col("user_id"), col("value"),
        round(col("value") - lag("value", 1).over(order), 2).as("delta_prev"),
        round(lead("value", 1).over(order) - col("value"), 2).as("delta_next"),
        round(avg("value").over(frame), 4).as("moving_avg5"))
      .orderBy("event_id")
  }

  private val windowAnalyticsSql =
    """WITH e AS (SELECT event_id, user_id, value, ts::TIMESTAMP AS ts FROM events)
      |SELECT event_id, user_id, value,
      |  round(value - lag(value, 1) OVER w, 2) AS delta_prev,
      |  round(lead(value, 1) OVER w - value, 2) AS delta_next,
      |  round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS moving_avg5
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_shipping_priority", shippingPriority, Some(shippingPrioritySql)),
    Q("q_nation_revenue", nationRevenue, Some(nationRevenueSql)),
    Q("q_window_analytics", windowAnalytics, Some(windowAnalyticsSql)))
}
