package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestionSpec extends SparkSpec {

  test("chunkText covers the text with the configured overlap") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val chunks = Ingestion.chunkText(text, size = 200, overlap = 40)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_._2.length <= 200))
    // Each consecutive pair overlaps by exactly `overlap` chars.
    chunks.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a.takeRight(40) == b.take(40))
      case _ =>
    }
    // Reconstruction: stepping chunks reassemble the original.
    val rebuilt = chunks.head._2 + chunks.tail.map(_._2.drop(40)).mkString
    assert(rebuilt == text)
  }

  test("chunkText on short text yields one chunk") {
    assert(Ingestion.chunkText("short", 200, 40) == Seq((0, "short")))
  }

  test("chunkDocuments explodes rows without losing docs") {
    val docs = graft.io.Tables.documents(spark, Sf)
    val chunks = Ingestion.chunkDocuments(docs, 200, 40)
    assert(chunks.select("doc_id").distinct().count() == docs.count())
  }

  test("chunkExchanges pairs user/assistant turns") {
    val out = Ingestion.chunkExchanges(Seq(
      ("user", "How do I partition a table in Spark properly?"),
      ("assistant", "Use partitionBy on the writer with a low-cardinality key."),
      ("user", "ok"), ("assistant", "!")), minChars = 30)
    assert(out.size == 1)
    assert(out.head.startsWith("Q: How do I partition"))
  }

  test("extractMemories classifies with confidence threshold") {
    import spark.implicits._
    val rows = Seq(
      "i prefer tabs over spaces",
      "the deploy failed with an error",
      "when the cache is cold then use the fallback",
      "plain statement of fact").toDF("text")
    val out = Ingestion.extractMemories(rows, "text", minConfidence = 0.5)
      .select("memory_type").as[String].collect().sorted.toSeq
    assert(out == Seq("anti_pattern", "heuristic", "preference"))
  }
}
