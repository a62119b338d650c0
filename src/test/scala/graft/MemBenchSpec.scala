package graft

import java.nio.file.Files

import graft.functions.{HashEmbedder, VectorFunctions}
import graft.sources.Ingestion
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LongMemEval-shaped benchmark as one Spark job (SURVEY §3.3): load a
  * JSON question set with haystack sessions (S9), embed once at write
  * time (O9, via mapPartitions with the deterministic hash embedder),
  * batch-kNN all questions in one pass (broadcast question vectors +
  * Window top-k), and compute IR metrics (A8). The oracle check:
  * each question's text is drawn from its answer session, so exact
  * self-retrieval must put the answer session at rank 1 → R@5 = MRR = 1.
  */
class MemBenchSpec extends SparkSpec {

  test("benchmark job: ingest → embed → batch retrieve → IR metrics") {
    import spark.implicits._

    // Build a small benchmark JSON: 10 questions × 20-session haystacks.
    val sessionText = (sid: Int) =>
      s"session $sid topic ${"abcdefghij".charAt(sid % 10)} " +
        s"content word${sid} word${sid + 1} word${sid * 7 % 13}"
    val json = (0 until 10).map { qid =>
      val haystack = (0 until 20).map { s =>
        val sid = qid * 100 + s
        s"""{"session_id": $sid, "text": "${sessionText(sid)}"}"""
      }.mkString("[", ",", "]")
      val answerSid = qid * 100 + (qid % 20)
      s"""{"question_id": $qid, "question": "${sessionText(answerSid)}", "answer_session_id": $answerSid, "haystack": $haystack}"""
    }
    val path = Files.createTempDirectory("membench").resolve("qs.json")
    Files.write(path, json.mkString("\n").getBytes)

    // S9: load + explode haystacks into one flat corpus.
    val corpus = Ingestion.loadBenchmarkJson(spark, path.toString)
    assert(corpus.count() == 200)

    // O9: write-time embedding via mapPartitions (executor-side batch).
    val embedded = corpus
      .select(col("question_id"), col("answer_session_id"), col("session_id"), col("session_text"))
      .as[(Long, Long, Long, String)]
      .mapPartitions(_.map { case (qid, ans, sid, text) =>
        (qid, ans, sid, HashEmbedder.embed(text))
      })
      .toDF("question_id", "answer_session_id", "session_id", "embedding")

    // Question vectors, broadcast against the corpus (batch kNN).
    val questions = corpus.select(col("question_id"), col("question")).distinct()
      .as[(Long, String)]
      .map { case (qid, q) => (qid, HashEmbedder.embed(q)) }
      .toDF("q_id", "q_vec")

    val w = Window.partitionBy("question_id").orderBy(col("sim").desc, col("session_id"))
    val ranked = embedded
      .join(broadcast(questions), col("question_id") === col("q_id"))
      .withColumn("sim", VectorFunctions.cosine(col("embedding"), col("q_vec")))
      .withColumn("rnk", row_number().over(w))

    // A8: Recall@5 and MRR over the answer session.
    val metrics = ranked
      .withColumn("rel", when(col("session_id") === col("answer_session_id"), 1L).otherwise(0L))
      .groupBy("question_id")
      .agg(
        sum(when(col("rnk") <= 5, col("rel")).otherwise(0L)).as("hit5"),
        min(when(col("rel") === 1L, col("rnk"))).as("first_hit"))
      .agg(
        avg(col("hit5").cast("double")).as("recall_at_5"),
        avg(lit(1.0) / col("first_hit")).as("mrr"),
        avg(when(col("first_hit") <= 5,
          lit(1.0) / log2(col("first_hit").cast("double") + lit(1.0))).otherwise(lit(0.0))).as("ndcg_at_5"))
      .head()

    assert(metrics.getDouble(0) == 1.0, s"recall@5 = ${metrics.getDouble(0)}")
    assert(metrics.getDouble(1) == 1.0, s"mrr = ${metrics.getDouble(1)}")
    // Exact self-retrieval puts the answer at rank 1 → DCG = IDCG = 1.
    assert(metrics.getDouble(2) == 1.0, s"ndcg@5 = ${metrics.getDouble(2)}")
  }

  test("MemEvalRunner reports recall, mrr, and ndcg through the Metrics surface") {
    val json = (0 until 4).map { qid =>
      val haystack = (0 until 6).map { s =>
        val sid = qid * 10 + s
        s"""{"session_id": $sid, "text": "alpha $sid beta ${sid * 3} gamma ${sid % 4}"}"""
      }.mkString("[", ",", "]")
      val answerSid = qid * 10 + (qid % 6)
      s"""{"question_id": $qid, "question": "alpha $answerSid beta ${answerSid * 3} gamma ${answerSid % 4}", "answer_session_id": $answerSid, "haystack": $haystack}"""
    }
    val path = Files.createTempDirectory("membench2").resolve("qs.json")
    Files.write(path, json.mkString("\n").getBytes)
    val m = MemEvalRunner.run(spark, path.toString, 5)
    assert(m.n == 4)
    assert(m.recall == 1.0 && m.mrr == 1.0 && m.ndcg == 1.0,
      s"self-retrieval must be perfect: $m")
    // No question_type in this dataset → one "unknown" group carrying
    // the whole question set.
    assert(m.perType.keySet == Set("unknown") && m.perType("unknown").n == 4)
  }

  test("MemEvalRunner breaks metrics down per question_type") {
    val json = (0 until 6).map { qid =>
      val haystack = (0 until 6).map { s =>
        val sid = qid * 10 + s
        s"""{"session_id": $sid, "text": "delta $sid eps ${sid * 3} zeta ${sid % 4}"}"""
      }.mkString("[", ",", "]")
      val answerSid = qid * 10 + (qid % 6)
      val qtype = if (qid % 2 == 0) "multi-session" else "temporal-reasoning"
      s"""{"question_id": $qid, "question_type": "$qtype", "question": "delta $answerSid eps ${answerSid * 3} zeta ${answerSid % 4}", "answer_session_id": $answerSid, "haystack": $haystack}"""
    }
    val path = Files.createTempDirectory("membench3").resolve("qs.json")
    Files.write(path, json.mkString("\n").getBytes)
    val m = MemEvalRunner.run(spark, path.toString, 5)
    assert(m.n == 6)
    assert(m.perType.keySet == Set("multi-session", "temporal-reasoning"))
    assert(m.perType("multi-session").n == 3 && m.perType("temporal-reasoning").n == 3)
    // Self-retrieval is perfect within every type, and the overall
    // numbers are the exact n-weighted rollup of the per-type sums.
    m.perType.values.foreach(t => assert(t.recall == 1.0 && t.mrr == 1.0 && t.ndcg == 1.0))
    assert(m.recall == 1.0 && m.mrr == 1.0 && m.ndcg == 1.0)
  }
}
