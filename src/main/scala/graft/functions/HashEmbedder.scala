package graft.functions

import scala.util.hashing.MurmurHash3

/** Deterministic hash-based embedder — the test-parity analog of the
  * reference's MockEmbedder (reference: alma/retrieval/embeddings.py:170-200:
  * hash-seeded pseudo-random unit vectors so tests never load a model).
  *
  * Each token contributes a reproducible pseudo-random vector (murmur3 of
  * `token:dim`), summed and L2-normalized. Same text → same vector, on
  * any executor, with no model download — usable both driver-side and
  * inside `mapPartitions` for distributed write-time embedding (the
  * reference's O9: embed at ingest, persist the vector column).
  */
object HashEmbedder {

  val Dim = 64

  def embed(text: String, dim: Int = Dim): Array[Float] = {
    val v = new Array[Double](dim)
    val tokens = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    var t = 0
    while (t < tokens.length) {
      var d = 0
      while (d < dim) {
        val h = MurmurHash3.stringHash(tokens(t) + ":" + d)
        v(d) += h.toDouble / Int.MaxValue
        d += 1
      }
      t += 1
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](dim)
    if (norm > 0) {
      var d = 0
      while (d < dim) { out(d) = (v(d) / norm).toFloat; d += 1 }
    }
    out
  }

  /** Batch encode (the executor-side entry point for mapPartitions). */
  def embedBatch(texts: Iterator[String], dim: Int = Dim): Iterator[Array[Float]] =
    texts.map(embed(_, dim))
}
