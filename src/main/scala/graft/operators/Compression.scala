package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compression / confidence / artifact-lookup pack.
  *
  * Reference semantics: alma/compression/pipeline.py:698-900 (A11:
  * split → score segments by importance markers → keep the top third →
  * reassemble in document order); alma/confidence/engine.py:20-540
  * (R17: combine success/failure/risk signals per candidate strategy
  * into a confidence + recommendation); alma/workflow/artifacts.py +
  * base.py:815-830 (J6: memory → artifact-link lookup join).
  */
object Compression {

  // A11 rule-based compression: 10-token segments, marker-scored, keep
  // ceil(n/3) best per doc, reassemble in document order.
  private def compressTopThird(s: SparkSession, dir: String): DataFrame = {
    // r16: chunks are built as a per-row PROJECTION (slice the token
    // array per chunk index) instead of the old token explode +
    // (doc_id, chunk_id) groupBy. collect_list has no map-side
    // combine, so that groupBy's exchange carried EVERY TOKEN of the
    // corpus, and the ranking window then re-shuffled the chunk rows a
    // second time (hashpartitioning(doc, chunk) does not satisfy the
    // window's doc_id clustering). Slicing in place leaves ONE
    // corpus exchange — the window's — carrying one row per chunk.
    // Same chunking (tokens 10i..10i+9, space-joined), same marker
    // score (count of marker tokens per chunk), same n_chunks
    // (ceil(n_toks/10) — exactly the old per-doc chunk-row count).
    val markers = Seq("data", "spark", "join", "query")
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        expr("(size(toks) + 9) div 10").cast("long").as("n_chunks"),
        posexplode(transform(
          sequence(lit(0), expr("(size(toks) + 9) div 10 - 1")),
          i => {
            val seg = slice(col("toks"), i * lit(10) + lit(1), lit(10))
            struct(array_join(seg, " ").as("chunk"),
              size(filter(seg, t => t.isin(markers: _*))).cast("long").as("score"))
          })))
      .select(col("doc_id"), col("n_chunks"),
        col("pos").cast("long").as("chunk_id"),
        col("col.chunk").as("chunk"), col("col.score").as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("chunk_id"))
    chunks
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= ceil(col("n_chunks").cast("double") / 3.0))
      .groupBy("doc_id")
      .agg(
        max("n_chunks").as("n_chunks"),
        count(lit(1)).as("kept"),
        array_join(transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          x => x.getField("chunk")), " ").as("compressed"))
      .orderBy("doc_id")
  }

  private val compressTopThirdSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    ceil(len(string_split(text, ' '))::DOUBLE / 10.0)::BIGINT AS n_chunks
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, n_chunks, i AS chunk_id,
      |    array_to_string(toks[(i * 10 + 1)::INT : (i * 10 + 10)::INT], ' ') AS chunk
      |  FROM t, generate_series(0, 1023) g(i)
      |  WHERE i < n_chunks),
      |scored AS (
      |  SELECT *, len(list_filter(string_split(chunk, ' '),
      |      x -> x IN ('data', 'spark', 'join', 'query')))::BIGINT AS score
      |  FROM chunks),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, chunk_id) AS rn
      |  FROM scored)
      |SELECT doc_id, max(n_chunks) AS n_chunks, count(*)::BIGINT AS kept,
      |  string_agg(chunk, ' ' ORDER BY chunk_id) AS compressed
      |FROM ranked
      |WHERE rn <= ceil(n_chunks::DOUBLE / 3.0)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // R17 confidence engine: per candidate strategy, blend success and
  // risk signals into a forward-looking confidence + recommendation.
  private def confidenceEngine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val conf = round(
      lit(0.5) + lit(0.3) * (col("n_succ").cast("double") / col("n"))
        - lit(0.3) * (col("n_fail").cast("double") / col("n")) + lit(5e-13), 6)
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_succ"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_fail"))
      .withColumn("confidence", conf)
      .withColumn("recommendation",
        when(col("confidence") > 0.55, "use")
          .when(col("confidence") > 0.45, "caution")
          .otherwise("avoid"))
      .orderBy("user_id")
  }

  private val confidenceEngineSql =
    """WITH g AS (
      |  SELECT user_id, count(*)::BIGINT AS n,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_succ,
      |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_fail
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n, n_succ, n_fail,
      |  round(0.5 + 0.3 * (n_succ::DOUBLE / n) - 0.3 * (n_fail::DOUBLE / n) + 5e-13, 6) AS confidence,
      |  CASE WHEN round(0.5 + 0.3 * (n_succ::DOUBLE / n) - 0.3 * (n_fail::DOUBLE / n) + 5e-13, 6) > 0.55 THEN 'use'
      |       WHEN round(0.5 + 0.3 * (n_succ::DOUBLE / n) - 0.3 * (n_fail::DOUBLE / n) + 5e-13, 6) > 0.45 THEN 'caution'
      |       ELSE 'avoid' END AS recommendation
      |FROM g ORDER BY user_id""".stripMargin

  // J6 artifact lookup: each purchase resolved to the user's
  // registration artifact (first signup event) via an equi-join against
  // a latest/first-per-key artifact registry.
  private def artifactLookup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val registry = e.filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("artifact_id"))
    e.filter(col("event_type") === "purchase")
      .join(broadcast(registry), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("artifact_id"))
      .orderBy("event_id")
  }

  private val artifactLookupSql =
    """WITH e AS (SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts FROM events),
      |registry AS (
      |  SELECT user_id, event_id AS artifact_id FROM (
      |    SELECT user_id, event_id, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |    FROM e WHERE event_type = 'signup') t
      |  WHERE rn = 1)
      |SELECT p.event_id, p.user_id, r.artifact_id
      |FROM e p LEFT JOIN registry r ON p.user_id = r.user_id
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_compress_topthird", compressTopThird, Some(compressTopThirdSql)),
    Q("q_confidence_engine", confidenceEngine, Some(confidenceEngineSql)),
    Q("q_artifact_lookup", artifactLookup, Some(artifactLookupSql)))
}
