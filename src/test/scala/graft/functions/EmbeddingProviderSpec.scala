package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The provider seam: embedColumn appends executor-side batch embeddings
  * matching the per-text encode, custom providers slot in, and the
  * MLlib Word2Vec impl proves the seam carries a trained model.
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

  test("Word2Vec provider trains on a corpus and encodes through the seam") {
    import spark.implicits._
    val corpus = Seq(
      "spark joins shuffle rows across executors",
      "broadcast joins skip the shuffle for small tables",
      "vector search ranks documents by cosine similarity",
      "cosine similarity compares embedding vectors",
      "parquet scans prune columns and push filters")
      .toDF("text")
    val p = Word2VecEmbeddingProvider.train(corpus, "text", dim = 16)
    assert(p.dim == 16)
    assert(p.wordVectors.nonEmpty && p.wordVectors.contains("cosine"))
    // Same text → same unit vector; text made of trained words is non-zero.
    val a = p.encode("cosine similarity")
    assert(a.toSeq == p.encode("cosine similarity").toSeq)
    assert(math.abs(a.map(x => x * x.toDouble).sum - 1.0) < 1e-5)
    // Out-of-vocabulary text degrades to the zero vector, not a crash.
    assert(p.encode("zzz qqq").forall(_ == 0f))
    // And it runs distributed through the same embedColumn seam.
    val out = EmbeddingProvider
      .embedColumn(corpus.withColumn("id", monotonically_increasing_id()),
        "text", "vec", p)
      .collect()
    assert(out.length == 5 && out.forall(_.getSeq[Float](2).length == 16))
  }

  test("MemEvalRunner runs end-to-end with the Word2Vec provider") {
    val json = (0 until 3).map { qid =>
      val haystack = (0 until 5).map { s =>
        val sid = qid * 10 + s
        s"""{"session_id": $sid, "text": "topic $sid alpha ${sid * 3} beta ${sid % 4}"}"""
      }.mkString("[", ",", "]")
      val answerSid = qid * 10 + (qid % 5)
      s"""{"question_id": $qid, "question": "topic $answerSid alpha ${answerSid * 3} beta ${answerSid % 4}", "answer_session_id": $answerSid, "haystack": $haystack}"""
    }
    val path = java.nio.file.Files.createTempDirectory("w2vbench").resolve("qs.json")
    java.nio.file.Files.write(path, json.mkString("\n").getBytes)
    val corpus = graft.sources.Ingestion.loadBenchmarkJson(spark, path.toString)
    val p = Word2VecEmbeddingProvider.train(corpus, "session_text", dim = 16)
    val m = graft.MemEvalRunner.run(spark, path.toString, 5, p)
    // A tiny 1-iter Word2Vec makes no ranking promises; the claim under
    // test is that a stateful trained model flows through the seam and
    // yields well-formed metrics.
    assert(m.n == 3)
    assert(m.recall >= 0.0 && m.recall <= 1.0 && m.mrr >= 0.0 && m.mrr <= 1.0)
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
