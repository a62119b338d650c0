package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion pack: text chunking and rule-based memory extraction — the
  * Spark expression of the reference's miners (reference:
  * alma/ingestion/file_miner.py:119-445 chunk + ingest;
  * alma/ingestion/conversation_miner.py:49-152 exchange chunker;
  * alma/ingestion/memory_extractor.py:52-470 marker-regex classify).
  *
  * Chunking is a flatMap (Dataset UDTF-analog): rows in, more rows out,
  * no shuffle. Classification is a `when` ladder over `rlike` columns —
  * whole-stage-codegen friendly, no UDF.
  */
object Ingestion {

  /** Fixed-size overlapping character chunks (file_miner.chunk_text
    * shape: size 800, overlap optional; here parameterized).
    */
  def chunkText(text: String, size: Int, overlap: Int): Seq[(Int, String)] = {
    require(size > overlap, "size must exceed overlap")
    val step = size - overlap
    (0 until math.max(1, (text.length + step - 1) / step))
      .map(i => (i, text.slice(i * step, i * step + size)))
      .filter(_._2.nonEmpty)
  }

  /** Chunk a documents DataFrame into (doc_id, chunk_id, chunk) rows. */
  def chunkDocuments(docs: DataFrame, size: Int = 200, overlap: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        chunkText(text, size, overlap).map { case (i, c) => (id, i.toLong, c) }
      }
      .toDF("doc_id", "chunk_id", "chunk")
  }

  /** Q+A exchange chunker for conversation exports
    * (conversation_miner.chunk_exchanges): pair each user turn with the
    * following assistant turn.
    */
  def chunkExchanges(turns: Seq[(String, String)], minChars: Int = 30): Seq[String] = {
    turns.sliding(2).collect {
      case Seq(("user", q), ("assistant", a)) if (q + a).length >= minChars =>
        s"Q: $q\nA: $a"
    }.toSeq
  }

  /** Benchmark dataset source (reference: benchmarks/longmemeval/
    * dataset.py:124-260 — questions each carrying a haystack of
    * sessions): JSON lines in, exploded (question_id, session_id,
    * session_text) rows out — one flat DataFrame for the whole
    * benchmark, so the retrieval sweep is a single job, not a
    * per-question loop.
    */
  def loadBenchmarkJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    // question_type is optional in the dataset (reference
    // benchmarks/longmemeval/dataset.py: defaults to "unknown"); JSON
    // schema inference drops absent fields, so probe the schema.
    val qtype =
      if (raw.columns.contains("question_type"))
        coalesce(col("question_type"), lit("unknown"))
      else lit("unknown")
    raw
      .select(col("question_id"), col("question"), col("answer_session_id"),
        qtype.as("question_type"), explode(col("haystack")).as("session"))
      .select(col("question_id"), col("question"), col("answer_session_id"),
        col("question_type"),
        col("session.session_id").as("session_id"),
        col("session.text").as("session_text"))
  }

  /** Rule-based memory extraction: classify text rows into memory types
    * by marker patterns with a confidence, keep rows ≥ minConfidence
    * (memory_extractor.extract_memories shape).
    */
  def extractMemories(rows: DataFrame, textCol: String, minConfidence: Double = 0.3): DataFrame = {
    val t = lower(col(textCol))
    val memoryType =
      when(t.rlike("\\b(prefer|always|never|want)\\b"), "preference")
        .when(t.rlike("\\b(fails|failed|error|broken|avoid)\\b"), "anti_pattern")
        .when(t.rlike("\\b(when|if)\\b.*\\b(then|use)\\b"), "heuristic")
        .otherwise("knowledge")
    val confidence =
      when(memoryType === "preference", 0.8)
        .when(memoryType === "anti_pattern", 0.7)
        .when(memoryType === "heuristic", 0.6)
        .otherwise(0.4)
    rows.withColumn("memory_type", memoryType)
      .withColumn("confidence", confidence)
      .filter(col("confidence") >= minConfidence)
  }
}
