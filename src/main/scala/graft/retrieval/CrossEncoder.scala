package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-encoder re-rank stage (reference: alma/retrieval/reranking.py:16-130
  * — optional CrossEncoder model, NoOp by default). The model itself is
  * not available in this environment, so the scorer is a deterministic
  * stub (token-overlap similarity standing in for model logits); the
  * Spark-side shape — candidates re-scored batch-wise per partition with
  * an executor-resident "model", no driver round-trip — is the real one.
  */
object CrossEncoder {

  /** STUB for a real cross-encoder: deterministic token-overlap score.
    * A production impl loads the model once per executor (lazy val in a
    * singleton) and scores the batch in one forward pass.
    */
  def score(query: String, text: String): Double = {
    val q = query.toLowerCase.split("\\s+").toSet
    val t = text.toLowerCase.split("\\s+").toSet
    if (q.isEmpty || t.isEmpty) 0.0
    else (q & t).size.toDouble / math.sqrt(q.size.toDouble * t.size)
  }

  /** Re-rank candidate rows (id, text) against the query; returns
    * (id, ce_score) sorted best-first with a deterministic tiebreak.
    */
  def rerank(spark: SparkSession, candidates: DataFrame, idCol: String,
      textCol: String, query: String): DataFrame = {
    import spark.implicits._
    candidates.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // Executor-side batch scoring: the model handle would be a
        // per-partition singleton here.
        it.map { case (id, text) => (id, score(query, text)) }
      }
      .toDF(idCol, "ce_score")
      .orderBy(col("ce_score").desc, col(idCol))
  }
}
