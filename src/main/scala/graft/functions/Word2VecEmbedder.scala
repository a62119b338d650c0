package graft.functions

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** V9: a model-backed `EmbeddingProvider` — MLlib Word2Vec trained on
  * the corpus (reference: alma/retrieval/embeddings.py:34-90
  * LocalEmbedder wraps a real sentence-transformer; this is the
  * in-sandbox analog that proves the seam carries a stateful trained
  * model, not just a hash function).
  *
  * The trained word→vector table travels to executors inside the
  * provider (one copy per executor via the task broadcast), and
  * `encodeBatch` is pure map-side work: mean-of-word-vectors then L2
  * normalization — the same composition ml.Word2VecModel.transform
  * applies, kept here so encoding needs no model object at call sites.
  *
  * 100 TB note: vocabulary size is the scale knob — `minCount` (and the
  * training sample) bounds the table that ships to executors; training
  * itself is a one-off MLlib job over a corpus sample, not something
  * rerun per query.
  */
final case class Word2VecEmbeddingProvider(
    wordVectors: Map[String, Array[Float]],
    dim: Int) extends EmbeddingProvider {

  def encodeBatch(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.map { text =>
      val acc = new Array[Double](dim)
      var hits = 0
      text.toLowerCase.split("\\s+").foreach { tok =>
        wordVectors.get(tok) match {
          case Some(wv) =>
            var d = 0
            while (d < dim) { acc(d) += wv(d); d += 1 }
            hits += 1
          case None => ()
        }
      }
      val out = new Array[Float](dim)
      if (hits > 0) {
        val mean = acc.map(_ / hits)
        val norm = math.sqrt(mean.map(x => x * x).sum)
        if (norm > 0) {
          var d = 0
          while (d < dim) { out(d) = (mean(d) / norm).toFloat; d += 1 }
        }
      }
      out
    }
}

object Word2VecEmbeddingProvider {

  /** Train on a text column and return the serializable provider.
    * Seeded, so a fixed corpus yields a reproducible model.
    */
  def train(
      corpus: DataFrame,
      textCol: String,
      dim: Int = 64,
      minCount: Int = 1,
      maxIter: Int = 1): Word2VecEmbeddingProvider = {
    val tokens = corpus
      .select(expr(s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')").as("tokens"))
    val model = new Word2Vec()
      .setInputCol("tokens").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount).setMaxIter(maxIter)
      .setSeed(42L)
      .fit(tokens)
    val vecs = model.getVectors.collect().map { r =>
      r.getString(0) -> r.getAs[MlVector](1).toArray.map(_.toFloat)
    }.toMap
    Word2VecEmbeddingProvider(vecs, dim)
  }
}
