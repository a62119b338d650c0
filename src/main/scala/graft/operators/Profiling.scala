package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling + constraint validation — the Deequ/TFDV-style
  * data-quality pass a 100 TB pipeline runs BEFORE any training job
  * reads the corpus (a silent schema or key defect multiplies through
  * every downstream stage). Both queries are single-scan shapes: the
  * profile is one aggregate per table (every column's counters computed
  * in the same map-side-combined pass, then unpivoted to rows); the
  * constraint checks are counting aggregates plus one broadcast-able
  * key anti-join — nothing here touches row-level data twice.
  */
object Profiling {

  // ---- q_profile_stats ------------------------------------------------
  /** One aggregate per table computes (n_null, n_distinct) for every
    * profiled column at once; the per-column rows are unpivoted from
    * that single result — a table of any width profiles in one scan.
    */
  private def profileOf(df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"rows_$c"),
        sum(col(c).isNull.cast("long")).as(s"null_$c"),
        countDistinct(col(c)).as(s"distinct_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // r16: unpivot with stack() instead of a union of per-column
    // selects — column pruning SPECIALIZED each union branch's
    // aggregate to its own column (different subtrees, no exchange
    // reuse), so the "one scan per table" claim was false in the plan:
    // the table scanned once per profiled column. stack keeps the one
    // wide aggregate and emits the per-column rows from its single
    // result row; values are the identical counters.
    val stacked = cols
      .map(c => s"'$c', rows_$c, null_$c, distinct_$c").mkString(", ")
    one.selectExpr(s"'$table' as table_name",
      s"stack(${cols.size}, $stacked) as (column_name, n_rows, n_null, n_distinct)")
  }

  private def profileStats(s: SparkSession, dir: String): DataFrame =
    profileOf(Tables.documents(s, dir), "documents",
      Seq("doc_id", "lang", "source", "n_chars"))
      .unionByName(profileOf(Tables.events(s, dir), "events",
        Seq("event_id", "user_id", "event_type", "value")))
      .orderBy("table_name", "column_name")

  private def profileSqlOf(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$table' AS table_name, '$c' AS column_name,
         |  count(*)::BIGINT AS n_rows,
         |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
         |  count(DISTINCT $c)::BIGINT AS n_distinct
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  private val profileStatsSql =
    s"""${profileSqlOf("documents", Seq("doc_id", "lang", "source", "n_chars"))}
       |UNION ALL
       |${profileSqlOf("events", Seq("event_id", "user_id", "event_type", "value"))}
       |ORDER BY table_name, column_name""".stripMargin

  // ---- q_validate_constraints ----------------------------------------
  /** The pre-training contract checks, each a violation COUNT (status
    * derives from it, so a failing corpus still produces a stable,
    * diffable report): key uniqueness, non-null text, the stored
    * n_chars/text consistency invariant, the declared lang domain, and
    * event→customer referential integrity (user_id ⊆ c_custkey — the
    * anti-join side is the key column only, broadcast-able at any fact
    * size).
    */
  private val KnownLangs = Seq("en", "fr", "de", "es", "zh")

  private def validateConstraints(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val events = Tables.events(s, dir)
    val custKeys = Tables.customer(s, dir).select(col("c_custkey").as("user_id"))
    // r16: all four document checks compute in ONE aggregate pass and
    // unpivot with stack() (the old one-aggregate-per-check union
    // scanned documents four times); same counters, same values. The
    // events check and the referential anti-join keep their own scans
    // (different tables / a join, not foldable).
    val docChecks = docs.agg(
      (count(lit(1)) - countDistinct(col("doc_id"))).cast("long").as("v_unique"),
      sum(col("text").isNull.cast("long")).cast("long").as("v_nonnull"),
      sum((col("n_chars") =!= length(col("text"))).cast("long"))
        .cast("long").as("v_len"),
      sum((!col("lang").isin(KnownLangs: _*)).cast("long")).cast("long").as("v_lang"))
      .selectExpr("stack(4, 'doc_id_unique', v_unique, 'text_non_null', v_nonnull, " +
        "'n_chars_matches_text', v_len, 'lang_in_domain', v_lang) " +
        "as (check_name, violations)")
      .select(col("check_name"), col("violations"),
        when(col("violations") === 0L, lit("pass")).otherwise(lit("fail")).as("status"))
    val evUnique = events
      .agg((count(lit(1)) - countDistinct(col("event_id"))).cast("long").as("violations"))
      .select(lit("event_id_unique").as("check_name"), col("violations"),
        when(col("violations") === 0L, lit("pass")).otherwise(lit("fail")).as("status"))
    val refOk = events.select("user_id").distinct()
      .join(custKeys, Seq("user_id"), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit("user_id_in_customers").as("check_name"), col("violations"),
        when(col("violations") === 0L, lit("pass")).otherwise(lit("fail")).as("status"))
    Seq(docChecks, evUnique, refOk)
      .reduce(_ unionByName _).orderBy("check_name")
  }

  private val validateConstraintsSql = {
    val langIn = KnownLangs.map(l => s"'$l'").mkString("(", ", ", ")")
    s"""WITH checks AS (
       |  SELECT 'doc_id_unique' AS check_name,
       |    (count(*) - count(DISTINCT doc_id))::BIGINT AS violations FROM documents
       |  UNION ALL SELECT 'text_non_null',
       |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT FROM documents
       |  UNION ALL SELECT 'n_chars_matches_text',
       |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT FROM documents
       |  UNION ALL SELECT 'lang_in_domain',
       |    sum(CASE WHEN lang NOT IN $langIn THEN 1 ELSE 0 END)::BIGINT FROM documents
       |  UNION ALL SELECT 'event_id_unique',
       |    (count(*) - count(DISTINCT event_id))::BIGINT FROM events
       |  UNION ALL SELECT 'user_id_in_customers',
       |    (SELECT count(*)::BIGINT FROM
       |      (SELECT DISTINCT user_id FROM events) u
       |      WHERE u.user_id NOT IN (SELECT c_custkey FROM customer)))
       |SELECT check_name, violations,
       |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
       |FROM checks ORDER BY check_name""".stripMargin
  }

  // ---- q_funnel -------------------------------------------------------
  /** Ordered conversion funnel view → click → purchase: a user counts
    * at a stage only if it happened AFTER their first prior-stage
    * event (min-timestamp chaining — two joins on the user dimension,
    * each against a per-user aggregate; every aggregate map-side
    * combines to ≤ |users| rows).
    */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    // r16 shape: the old three-stage chain ran THREE count() actions,
    // and each stage's plan re-derived its predecessors (t3.count()
    // re-scanned events and re-built t1 and t2 — six event scans and
    // three shuffle joins across the three jobs). The per-user stage
    // times are min-aggregates over one user's events, so they compute
    // in ONE pass as three unordered whole-partition windows over the
    // SAME user_id partitioning (no second exchange: each window's
    // min(when(...)) only needs the rows of its own user, and window k
    // may reference window k-1's column because it is a prior Window
    // operator in the same stage):
    //   t1 = min view-time; t2 = min click-time > t1 (null when t1 is
    //   null, exactly the old inner-join semantics); t3 likewise.
    // One row per user survives (any row carries the user's three
    // window values; groupBy(user_id) reuses the window's partitioning
    // with no exchange), and all three stage counts come back in ONE
    // single-row collect instead of three count() jobs.
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val staged = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("tu"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("tu") > col("t1"), col("tu")))
          .over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("tu") > col("t2"), col("tu")))
          .over(byUser))
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
    val r = staged.agg(
      count(col("t1")).as("n1"), count(col("t2")).as("n2"),
      count(col("t3")).as("n3")).head()
    val (n1, n2, n3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val rows = Seq(("1_view", n1, 1.0),
      ("2_click_after_view", n2, if (n1 == 0) 0.0 else n2.toDouble / n1),
      ("3_purchase_after_click", n3, if (n2 == 0) 0.0 else n3.toDouble / n2))
    import s.implicits._
    rows.toDF("stage", "users", "conv")
      .select(col("stage"), col("users"), round(col("conv"), 4).as("conv"))
      .orderBy("stage")
  }

  private val funnelSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
      |t1 AS (SELECT user_id, min(tu) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT ev.user_id, min(tu) AS t2 FROM ev JOIN t1 USING (user_id)
      |       WHERE event_type = 'click' AND tu > t1 GROUP BY 1),
      |t3 AS (SELECT ev.user_id, min(tu) AS t3 FROM ev JOIN t2 USING (user_id)
      |       WHERE event_type = 'purchase' AND tu > t2 GROUP BY 1),
      |n AS (SELECT (SELECT count(*) FROM t1)::BIGINT AS n1,
      |             (SELECT count(*) FROM t2)::BIGINT AS n2,
      |             (SELECT count(*) FROM t3)::BIGINT AS n3)
      |SELECT '1_view' AS stage, n1 AS users, round(1.0::DOUBLE, 4) AS conv FROM n
      |UNION ALL SELECT '2_click_after_view', n2,
      |  round(CASE WHEN n1 = 0 THEN 0.0 ELSE n2::DOUBLE / n1 END, 4) FROM n
      |UNION ALL SELECT '3_purchase_after_click', n3,
      |  round(CASE WHEN n2 = 0 THEN 0.0 ELSE n3::DOUBLE / n2 END, 4) FROM n
      |ORDER BY stage""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_profile_stats", profileStats, Some(profileStatsSql)),
    Q("q_validate_constraints", validateConstraints, Some(validateConstraintsSql)),
    Q("q_funnel", funnel, Some(funnelSql)))
}
