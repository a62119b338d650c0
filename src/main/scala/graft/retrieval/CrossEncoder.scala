package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable pair scorer for the re-rank stage (reference:
  * alma/retrieval/reranking.py:16-130 — optional CrossEncoder model,
  * NoOp by default). Implementations are Serializable and score on
  * executors; a real model impl holds its handle as a per-JVM singleton
  * and scores each partition batch in one forward pass.
  */
trait CrossScorer extends Serializable {
  def score(query: String, text: String): Double
}

/** Deterministic lexical scorer — the model-free default (the
  * reference ships NoOp when no model is configured; this is the
  * strictly-stronger analog): cosine of the distinct token sets.
  */
object LexicalCrossScorer extends CrossScorer {
  def score(query: String, text: String): Double = {
    val q = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    if (q.isEmpty || t.isEmpty) 0.0
    else (q & t).size.toDouble / math.sqrt(q.size.toDouble * t.size)
  }
}

object CrossEncoder {

  /** Back-compat alias for the default scorer. */
  def score(query: String, text: String): Double = LexicalCrossScorer.score(query, text)

  /** Re-rank candidate rows (id, text) against the query; returns
    * (id, ce_score) sorted best-first with a deterministic tiebreak.
    * Scoring runs inside mapPartitions so a model-backed CrossScorer
    * amortizes its setup per partition.
    */
  def rerank(spark: SparkSession, candidates: DataFrame, idCol: String,
      textCol: String, query: String,
      scorer: CrossScorer = LexicalCrossScorer): DataFrame = {
    import spark.implicits._
    candidates.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, scorer.score(query, text)) }
      }
      .toDF(idCol, "ce_score")
      .orderBy(col("ce_score").desc, col(idCol))
  }
}
