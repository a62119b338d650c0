package graft.functions

import graft.SparkSpec

/** The provider seam: embedColumn appends executor-side batch embeddings
  * matching the per-text encode, and custom providers slot in.
  */
class EmbeddingProviderSpec extends SparkSpec {

  test("embedColumn output matches per-text hash embedding") {
    import spark.implicits._
    val df = Seq((1L, "spark join"), (2L, "duck table"), (3L, "vector scan"))
      .toDF("id", "text")
    val out = EmbeddingProvider
      .embedColumn(df, "text", "embedding", HashEmbeddingProvider)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(1L) == HashEmbedder.embed("spark join").toSeq)
    assert(out(3L) == HashEmbedder.embed("vector scan").toSeq)
  }

  test("embedColumn batches respect a small batch size") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val out = EmbeddingProvider
      .embedColumn(df, "text", "vec", HashEmbeddingProvider, batchSize = 3)
      .collect()
    assert(out.length == 20)
    assert(out.forall(_.getSeq[Float](2).length == HashEmbeddingProvider.dim))
  }

  test("a custom provider slots into the same seam") {
    import spark.implicits._
    object ConstProvider extends EmbeddingProvider {
      val dim = 4
      def encodeBatch(texts: Iterator[String]): Iterator[Array[Float]] =
        texts.map(t => Array.fill(dim)(t.length.toFloat))
    }
    val out = EmbeddingProvider
      .embedColumn(Seq((1L, "abc")).toDF("id", "text"), "text", "vec", ConstProvider)
      .head()
    assert(out.getSeq[Float](2) == Seq(3f, 3f, 3f, 3f))
  }
}
