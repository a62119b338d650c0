package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator pack: filtered scans, predicates, top-k,
  * aggregations, window patterns, join family (equi / broadcast / semi /
  * anti), set ops, scalar-function pack, JSON access, temporal as-of, and
  * an iterative graph traversal — the Spark expression of the reference's
  * storage/query surface (reference: alma/storage/sqlite_local.py:934-1165
  * filtered scans; alma/types.py:88-141 scope filters;
  * alma/workflow/checkpoint.py:228-257 latest-per-key;
  * alma/learning/forgetting.py:441-515 quota windows;
  * alma/graph/store.py:535-676 temporal/graph queries).
  *
  * Every query is a declarative DataFrame plan: filters and projections
  * reach the Parquet scan via Catalyst pushdown, small dimensions are
  * broadcast, and per-group top-k uses Window row_number (never a global
  * sort of the full table) — all of which hold unchanged on a
  * 1000-executor cluster.
  */
object Relational {

  // -------------------------------------------------------------------
  // F1/F2 filtered scan: equality + range predicates, pushed to Parquet.
  private def filterScan(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("value") >= 100.0)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  private val filterScanSql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' AND value >= 100.0
      |ORDER BY event_id""".stripMargin

  // F2 min-confidence analog: numeric threshold scan on customer.
  private def filterThreshold(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_acctbal") >= 5000.0)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")

  private val filterThresholdSql =
    """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |WHERE c_acctbal >= 5000.0 ORDER BY c_custkey""".stripMargin

  // F8 agent-set membership (isin) — multi-agent read set.
  private def filterIsin(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .filter(col("s_nationkey").isin(0, 1, 2, 3))
      .select("s_suppkey", "s_name", "s_nationkey")
      .orderBy("s_suppkey")

  private val filterIsinSql =
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier
      |WHERE s_nationkey IN (0, 1, 2, 3) ORDER BY s_suppkey""".stripMargin

  // F5 conjunctive scope filter (tenant/workflow-style AND of ids).
  private def scopeFilter(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  private val scopeFilterSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin

  // R4 global top-k with deterministic tiebreak (TakeOrderedAndProject —
  // no global sort materialized).
  private def topk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(20)

  private val topkSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // A4 stats: count per type (the reference's get_stats).
  private def statsCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  private val statsCountsSql =
    """SELECT event_type, count(*)::BIGINT AS cnt FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // TPC-H Q1-shaped pricing summary: partial (map-side) aggregation is
  // Catalyst-native; only the tiny grouped result shuffles.
  private def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*)::BIGINT AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // J10/§2.7 latest row per (user, event_type) — the checkpoint
  // latest-per-branch pattern.
  private def windowLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id", "event_type")
  }

  private val windowLatestSql =
    """WITH e AS (SELECT event_id, user_id, event_type, value, ts::TIMESTAMP AS ts FROM events)
      |SELECT user_id, event_type, event_id, value, epoch_us(ts) AS ts_us FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM e)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // §2.7 top-k per group (per-query/per-type top-k of the retrieval path).
  private def windowTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  private val windowTopkPerGroupSql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // A10 quota enforcement: rows beyond a per-key quota (prune set size).
  private def quotaOverflow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 50)
      .groupBy("user_id").agg(count(lit(1)).as("overflow_cnt"))
      .orderBy("user_id")
  }

  private val quotaOverflowSql =
    """SELECT user_id, count(*)::BIGINT AS overflow_cnt FROM (
      |  SELECT user_id, row_number() OVER (
      |    PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      |  FROM events)
      |WHERE rn > 50 GROUP BY user_id ORDER BY user_id""".stripMargin

  // J4 equi-join + aggregate (feedback-join shape).
  private def joinCustomerOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")

  private val joinCustomerOrdersSql =
    """SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // J5 broadcast dimension join: part is small relative to lineitem, so
  // it is broadcast — no shuffle of the fact table.
  private def joinBroadcastDim(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("p_brand")

  private val joinBroadcastDimSql =
    """SELECT p_brand, count(*)::BIGINT AS n_items,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // Anti-join: archive-restore / write-guard shape (rows with no match):
  // orders that have no lineitem rows.
  private def antiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")

  private val antiJoinSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
      |ORDER BY o_orderkey""".stripMargin

  // Semi-join: existence filter.
  private def semiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_brand")
      .orderBy("p_partkey")

  private val semiJoinSql =
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
      |ORDER BY p_partkey""".stripMargin

  // §2.8 union + distinct (multi-agent result concatenation).
  private def unionSet(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "purchase").select("user_id")
      .union(e.filter(col("event_type") === "error").select("user_id"))
      .distinct()
      .orderBy("user_id")
  }

  private val unionSetSql =
    """SELECT DISTINCT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id FROM events WHERE event_type = 'error') t
      |ORDER BY user_id""".stripMargin

  // §2.8 except: high-value purchasers who never had a high-value error.
  private def exceptSet(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "purchase" && col("value") > 150.0).select("user_id")
      .except(e.filter(col("event_type") === "error" && col("value") > 150.0).select("user_id"))
      .orderBy("user_id")
  }

  private val exceptSetSql =
    """SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150.0
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 150.0
      |ORDER BY user_id""".stripMargin

  // J8 temporal as-of: for each purchase, the user's most recent prior
  // 'view'. Implemented as a running last_value over a single
  // partition-sorted pass — no join, no re-shuffle per probe; this is the
  // formulation that survives 100 TB (one shuffle by user, one sort).
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("last_view_us",
        last(when(col("event_type") === "view", unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("last_view_us"))
      .orderBy("event_id")
  }

  private val asofJoinSql =
    """WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts FROM events)
      |SELECT event_id, user_id, epoch_us(ts) AS ts_us, last_view_us FROM (
      |  SELECT event_id, user_id, event_type, ts,
      |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_us
      |  FROM e) t
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // J7 graph traversal: 2-hop co-purchase BFS from customer 1 via
  // iterative joins (frontier ⋈ edges), the Spark shape of the
  // reference's BFS. The first-hop part set is tiny → broadcast.
  private def graphTwoHop(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val seedParts = o.filter(col("o_custkey") === 1)
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .select("l_partkey").distinct()
    l.join(broadcast(seedParts), Seq("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey").distinct()
      .filter(col("o_custkey") =!= 1)
      .orderBy("o_custkey")
  }

  private val graphTwoHopSql =
    """WITH seed_parts AS (
      |  SELECT DISTINCT l_partkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE o_custkey = 1)
      |SELECT DISTINCT o_custkey FROM lineitem
      |JOIN seed_parts USING (l_partkey)
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey <> 1 ORDER BY o_custkey""".stripMargin

  // J7 path-collecting BFS (store.py:561-676 returns paths): the
  // supplier→nation→region membership chain as an undirected graph,
  // walked 3 hops from supplier S1 through GraphStore.bfsPaths. The
  // oracle enumerates simple paths with a recursive CTE and keeps the
  // (min hop, lexicographically-min path) row per entity — provably the
  // same selection the greedy per-hop frontier makes.
  private def graphPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select(concat(lit("S"), col("s_suppkey")).as("src"),
        concat(lit("N"), col("s_nationkey")).as("dst"))
    val nat = Tables.nation(s, dir)
      .select(concat(lit("N"), col("n_nationkey")).as("src"),
        concat(lit("R"), col("n_regionkey")).as("dst"))
    val rels = sup.unionByName(nat)
      .select(concat(col("src"), lit("-"), col("dst")).as("id"),
        col("src").as("sourceId"), col("dst").as("targetId"),
        lit("in").as("relationType"), lit(1.0).as("confidence"),
        lit(null).cast("timestamp").as("validFrom"),
        lit(null).cast("timestamp").as("validTo"))
      .as[graft.graph.Relationship]
    val g = new graft.graph.GraphStore(s.emptyDataset[graft.graph.Entity], rels)
    g.bfsPaths(Seq("S1"), maxHops = 3)
      .select(col("entity_id"), col("hop"),
        array_join(col("path"), "->").as("path"))
      .orderBy("hop", "entity_id")
  }

  private val graphPathsSql =
    """WITH RECURSIVE edges AS (
      |  SELECT 'S' || s_suppkey AS src, 'N' || s_nationkey AS dst FROM supplier
      |  UNION ALL SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
      |und AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
      |walk(entity_id, hop, path) AS (
      |  SELECT 'S1', 0, ['S1']
      |  UNION ALL
      |  SELECT u.dst, w.hop + 1, list_append(w.path, u.dst)
      |  FROM walk w JOIN und u ON u.src = w.entity_id
      |  WHERE w.hop < 3 AND NOT list_contains(w.path, u.dst)),
      |best AS (
      |  SELECT entity_id, hop, path,
      |    row_number() OVER (PARTITION BY entity_id ORDER BY hop, path) AS rn
      |  FROM walk)
      |SELECT entity_id, hop::INT AS hop, array_to_string(path, '->') AS path
      |FROM best WHERE rn = 1 ORDER BY hop, entity_id""".stripMargin

  // §2.9 scalar-function pack: string ops + chars/4 token estimator +
  // md5 fingerprint (the reference's tokenizer estimate and cache keys).
  private def scalarPack(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head"),
        length(col("text")).cast("long").as("len"),
        expr("length(text) div 4").cast("long").as("est_tokens"),
        md5(col("text").cast("binary")).as("fp"))
      .orderBy("doc_id")

  private val scalarPackSql =
    """SELECT doc_id, upper(substr(text, 1, 12)) AS head,
      |  length(text)::BIGINT AS len,
      |  (length(text) // 4)::BIGINT AS est_tokens,
      |  md5(text) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // §2.9 JSON access: metadata side-channel extraction.
  private def jsonGet(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(10)).as("k_bucket"))
      .orderBy("event_id")

  private val jsonGetSql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
      |FROM events ORDER BY event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_filter_scan", filterScan, Some(filterScanSql)),
    Q("q_filter_threshold", filterThreshold, Some(filterThresholdSql)),
    Q("q_filter_isin", filterIsin, Some(filterIsinSql)),
    Q("q_scope_filter", scopeFilter, Some(scopeFilterSql)),
    Q("q_topk", topk, Some(topkSql)),
    Q("q_stats_counts", statsCounts, Some(statsCountsSql)),
    Q("q_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    Q("q_window_latest", windowLatest, Some(windowLatestSql)),
    Q("q_window_topk_group", windowTopkPerGroup, Some(windowTopkPerGroupSql)),
    Q("q_quota_overflow", quotaOverflow, Some(quotaOverflowSql)),
    Q("q_join_customer_orders", joinCustomerOrders, Some(joinCustomerOrdersSql)),
    Q("q_join_broadcast_dim", joinBroadcastDim, Some(joinBroadcastDimSql)),
    Q("q_anti_join", antiJoin, Some(antiJoinSql)),
    Q("q_semi_join", semiJoin, Some(semiJoinSql)),
    Q("q_union_set", unionSet, Some(unionSetSql)),
    Q("q_except_set", exceptSet, Some(exceptSetSql)),
    Q("q_asof_join", asofJoin, Some(asofJoinSql)),
    Q("q_graph_2hop", graphTwoHop, Some(graphTwoHopSql)),
    Q("q_graph_paths", graphPaths, Some(graphPathsSql)),
    Q("q_scalar_pack", scalarPack, Some(scalarPackSql)),
    Q("q_json_get", jsonGet, Some(jsonGetSql)))
}
