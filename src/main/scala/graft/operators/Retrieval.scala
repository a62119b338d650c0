package graft.operators

import graft.Q
import graft.io.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship retrieval pipeline — the reference's read path as one
  * declarative Spark plan (reference: alma/retrieval/engine.py:158-374:
  * embed query → kNN similarity → predicate filter → multi-factor score →
  * threshold → top-k; scoring weights alma/retrieval/scoring.py:96-121).
  *
  * Shape at scale: one scan of the memory table with the similarity and
  * score as columns (no side index, no reorder step — the score
  * propagation bug class of the reference, BENCHMARK-REPORT.md §3, cannot
  * exist here), ending in a TakeOrderedAndProject top-k.
  */
object Retrieval {

  /** filter → similarity → composite score → threshold → top-k over the
    * documents ⋈ embeddings corpus, querying with vector 0.
    */
  def pipeline(s: SparkSession, dir: String): DataFrame =
    pipelineScored(s, dir)
      .filter(col("score") >= 0.2)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)

  private val pipelineSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |j AS (
      |  SELECT d.doc_id, d.lang, d.n_chars,
      |    list_cosine_similarity(e.v, (SELECT qv FROM q)) AS rawsim
      |  FROM documents d JOIN e ON d.doc_id = e.vec_id),
      |sc AS (
      |  SELECT doc_id, lang, round(rawsim, 4) AS sim,
      |    round(0.5 * rawsim
      |        + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0)
      |        + 0.2 * (CASE WHEN lang = 'en' THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END), 6) AS score
      |  FROM j)
      |SELECT doc_id, lang, sim, score FROM sc
      |WHERE score >= 0.2
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** R7 MMR diversity re-rank (greedy selection is inherently
    * sequential, so it runs driver-side over the collected candidate
    * top-N — bounded at ≤ 30 rows regardless of corpus size, SURVEY
    * §7.4; reference: alma/retrieval/engine.py:639-715).
    */
  private def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.retrieval.PostProcess
    val candidates = pipelineScored(s, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(30)
      .select("doc_id", "score", "sim")
      .collect()
      .map(r => PostProcess.Candidate(r.getLong(0), r.getDouble(1), r.getDouble(2), ""))
      .toSeq
    PostProcess.mmr(candidates, lambda = 0.5, k = 10)
      .zipWithIndex
      .map { case (c, i) => (i.toLong + 1, c.id, c.score, c.sim) }
      .toDF("rank", "doc_id", "score", "sim")
  }

  /** DuckDB oracle for the greedy MMR: a recursive CTE that picks one
    * candidate per step. The Scala penalty `max over selected of
    * sqrt(max(0, sim·sim_sel))` collapses to
    * `sqrt(greatest(0, sim·mx, sim·mn))` because sqrt is monotone and
    * the argmax of sim·sim_sel is at the max (sim ≥ 0) or min (sim < 0)
    * selected sim — so the recursion only carries (mx, mn) plus the
    * picked-id list for exclusion, not pairwise state.
    */
  private val mmrSql =
    """WITH RECURSIVE
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |j AS (
      |  SELECT d.doc_id, d.lang, d.n_chars,
      |    list_cosine_similarity(e.v, (SELECT qv FROM q)) AS rawsim
      |  FROM documents d JOIN e ON d.doc_id = e.vec_id),
      |cand AS (
      |  SELECT doc_id, round(rawsim, 4) AS sim,
      |    round(0.5 * rawsim
      |        + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0)
      |        + 0.2 * (CASE WHEN lang = 'en' THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END), 6) AS score
      |  FROM j ORDER BY score DESC, doc_id LIMIT 30),
      |sel AS (
      |  (SELECT 1::BIGINT AS rank, doc_id, score, sim,
      |          [doc_id] AS picked, sim AS mx, sim AS mn
      |   FROM cand ORDER BY score DESC, doc_id LIMIT 1)
      |  UNION ALL
      |  (SELECT (s.rank + 1)::BIGINT, c.doc_id, c.score, c.sim,
      |          list_append(s.picked, c.doc_id),
      |          greatest(s.mx, c.sim), least(s.mn, c.sim)
      |   FROM sel s, cand c
      |   WHERE s.rank < 10 AND NOT list_contains(s.picked, c.doc_id)
      |   ORDER BY c.score - 0.5 * sqrt(greatest(0.0, c.sim * s.mx, c.sim * s.mn)) DESC, c.doc_id
      |   LIMIT 1))
      |SELECT rank, doc_id, score, sim FROM sel ORDER BY rank""".stripMargin

  /** The pipeline's scored candidate set before top-k (shared by the
    * flagship query and the MMR stage).
    */
  private def pipelineScored(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val joined = Tables.documents(s, dir)
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
    val sim = VectorFunctions.cosineConst(col("embedding"), q)
    val lengthPrior = least(col("n_chars").cast("double") / lit(500.0), lit(1.0))
    val langPrior = when(col("lang") === "en", lit(1.0)).otherwise(lit(0.5))
    joined
      .withColumn("sim", round(sim, 4))
      .withColumn("score", round(lit(0.5) * sim + lit(0.3) * lengthPrior + lit(0.2) * langPrior, 6))
      .select("doc_id", "lang", "sim", "score")
  }

  val all: Seq[Q] = Seq(
    Q("q_retrieval_pipeline", pipeline, Some(pipelineSql)),
    Q("q_mmr_rerank", mmrRerank, Some(mmrSql)))
}
