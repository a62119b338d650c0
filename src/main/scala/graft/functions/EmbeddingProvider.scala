package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pluggable embedding seam (reference: alma/retrieval/embeddings.py:14-31
  * EmbeddingProvider protocol — encode(texts) -> vectors). Implementations
  * are Serializable and run executor-side inside `mapPartitions`, so a
  * real model impl loads its weights once per partition and encodes in
  * batches; the engine never routes text through the driver.
  */
trait EmbeddingProvider extends Serializable {

  def dim: Int

  /** Executor-side batch encode. Called with a whole partition's texts;
    * implementations should amortize model setup across the iterator.
    */
  def encodeBatch(texts: Iterator[String]): Iterator[Array[Float]]

  def encode(text: String): Array[Float] = encodeBatch(Iterator(text)).next()
}

/** Deterministic hash provider — the MockEmbedder-parity impl
  * (embeddings.py:170-200) backing tests and the benchmark runner.
  */
object HashEmbeddingProvider extends EmbeddingProvider {
  val dim: Int = HashEmbedder.Dim
  def encodeBatch(texts: Iterator[String]): Iterator[Array[Float]] =
    HashEmbedder.embedBatch(texts, dim)
}

object EmbeddingProvider {

  /** Append `outCol` (array<float>) to `df` by batch-encoding `textCol`
    * through the provider — the write-time-embed shape (SURVEY O9/V9):
    * one pass, no shuffle, model work stays on executors. `batchSize`
    * bounds the rows held per encode call (a model impl's GPU/graph
    * batch), not partition memory.
    */
  def embedColumn(
      df: DataFrame,
      textCol: String,
      outCol: String,
      provider: EmbeddingProvider,
      batchSize: Int = 256): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = provider.encodeBatch(batch.iterator.map(_.getString(idx))).toArray
        batch.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ vecs(i).toSeq)
        }
      }
    }(Encoders.row(schema))
  }
}
