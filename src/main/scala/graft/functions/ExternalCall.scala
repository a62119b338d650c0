package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O12: the external-model call stage — the seam where an LLM (or any
  * remote scorer) slots into the consolidation-merge, verification, and
  * compression paths (reference: alma/consolidation/engine.py:576-657
  * `_call_llm`; alma/retrieval/verification.py:563-688; rate limiter
  * alma/consolidation/rate_limit.py:29-77).
  *
  * Spark shape: prompts are rows; the call runs inside `mapPartitions`
  * so a real client amortizes its connection per partition, and ALL
  * partitions on one executor share a per-JVM token bucket — the rate
  * cap is per executor process, which is the unit that owns an API
  * connection. The engine's deterministic fallbacks (token-overlap
  * verification, rule-based merge/compression) stay the default; these
  * stages are strictly optional, so no oracle query depends on them.
  */
trait ExternalCompleter extends Serializable {
  def complete(prompt: String): String
}

/** Deterministic model-free completer (the test/default impl, mirroring
  * the reference's mock client): answers every verification prompt as
  * verified with a confidence derived from the prompt hash — stable
  * across runs and executors.
  */
object EchoCompleter extends ExternalCompleter {
  def complete(prompt: String): String = {
    val conf = (math.abs(prompt.hashCode % 100) / 100.0)
    s"STATUS: verified\nCONFIDENCE: $conf\nREASON: echo of ${prompt.length} chars"
  }
}

/** Windowed token bucket, the reference's algorithm
  * (rate_limit.py:29-77): at most `calls` acquisitions per
  * `periodMillis` window; an exhausted window sleeps until it rolls
  * over. Clock and sleeper are injectable so tests prove pacing without
  * real waits.
  */
final class TokenBucket(
    calls: Int,
    periodMillis: Long,
    clock: () => Long = () => System.currentTimeMillis(),
    sleeper: Long => Unit = Thread.sleep) {

  private var windowStart = clock()
  private var callsMade = 0

  /** Blocks until a call slot is available. */
  def acquire(): Unit = synchronized {
    var acquired = false
    while (!acquired) {
      val now = clock()
      if (now - windowStart >= periodMillis) { callsMade = 0; windowStart = now }
      if (callsMade < calls) { callsMade += 1; acquired = true }
      else {
        val wait = periodMillis - (clock() - windowStart)
        if (wait > 0) sleeper(wait)
      }
    }
  }
}

object TokenBucket {
  // Per-JVM registry: every partition that runs in this executor
  // process and names the same key shares one bucket, so the cap is
  // per-executor (cluster-wide rate = cap × executors — size the cap
  // accordingly), not per-task.
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, TokenBucket]()

  def forKey(key: String, calls: Int, periodMillis: Long): TokenBucket =
    registry.computeIfAbsent(key, _ => new TokenBucket(calls, periodMillis))
}

object ExternalCall {

  /** The generic distributed call stage: (id, prompt) rows in,
    * (id, response) rows out, rate-limited per executor. Everything
    * upstream (building prompts from grouped memories) and downstream
    * (parsing responses) stays declarative; only the call itself is
    * imperative.
    */
  def callStage(
      prompts: DataFrame,
      idCol: String,
      promptCol: String,
      completer: ExternalCompleter,
      limiterKey: String = "llm",
      callsPerPeriod: Int = 100,
      periodMillis: Long = 60000L): DataFrame = {
    val spark = prompts.sparkSession
    import spark.implicits._
    prompts.select(col(idCol).cast("long"), col(promptCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val bucket = TokenBucket.forKey(limiterKey, callsPerPeriod, periodMillis)
        it.map { case (id, prompt) =>
          bucket.acquire()
          (id, completer.complete(prompt))
        }
      }
      .toDF(idCol, "response")
  }

  /** Render the ground-truth verification prompt
    * (verification.py:588-601: memory content + capped source list +
    * fixed response contract).
    */
  def verifyPrompt(content: String, sources: Seq[String], maxSources: Int = 5): String = {
    val limited = sources.take(maxSources)
    s"""Verify if this memory is consistent with the authoritative sources.
       |
       |Memory to verify:
       |$content
       |
       |Authoritative sources:
       |${limited.map(s => s"- $s").mkString("\n")}
       |
       |Respond in this exact format (no other text):
       |STATUS: verified|contradicted|uncertain
       |CONFIDENCE: 0.0-1.0
       |REASON: Brief explanation (one sentence)""".stripMargin
  }

  /** Render the heuristic-merge prompt body (engine.py:576-593: the
    * numbered condition/strategy/confidence/occurrences block handed to
    * the model).
    */
  def mergePrompt(group: Seq[(String, String, Double, Long)]): String =
    group.zipWithIndex.map { case ((condition, strategy, confidence, occ), i) =>
      f"""Heuristic ${i + 1}:
         |  Condition: $condition
         |  Strategy: $strategy
         |  Confidence: $confidence%.2f
         |  Occurrences: $occ""".stripMargin
    }.mkString("\n\n")

  /** Optional LLM-backed consolidation-merge stage
    * (engine.py:576-657 `_llm_merge_*`): member rows in — (group_id,
    * condition, strategy, confidence, occurrences), the connected-
    * component output shape — one rendered merge prompt per group, one
    * rate-limited call per group, (group_id, response) out. The
    * deterministic merge aggregates stay the default (the reference's
    * no-client fallback); this stage composes AFTER grouping, so the
    * expensive call count is bounded by the number of duplicate groups,
    * never corpus size.
    */
  def mergeStage(
      members: DataFrame,
      completer: ExternalCompleter,
      limiterKey: String = "merge",
      callsPerPeriod: Int = 100,
      periodMillis: Long = 60000L): DataFrame = {
    val spark = members.sparkSession
    import spark.implicits._
    val prompts = members
      .select(col("group_id").cast("long"), col("condition").cast("string"),
        col("strategy").cast("string"), col("confidence").cast("double"),
        col("occurrences").cast("long"))
      .as[(Long, String, String, Double, Long)]
      .groupByKey(_._1)
      .mapGroups { (gid, it) =>
        // Deterministic member order inside the prompt regardless of
        // partitioning.
        val group = it.toSeq.sortBy(t => (t._2, t._3))
          .map(t => (t._2, t._3, t._4, t._5))
        (gid, mergePrompt(group))
      }
      .toDF("group_id", "prompt")
    callStage(prompts, "group_id", "prompt", completer,
      limiterKey, callsPerPeriod, periodMillis)
  }

  final case class Verdict(status: String, confidence: Double, reason: String)

  /** Parse the STATUS/CONFIDENCE/REASON response contract; malformed
    * responses degrade to unverifiable/0.5 exactly like the reference's
    * failure path (verification.py:609-620).
    */
  def parseVerdict(response: String): Verdict = {
    val lines = response.linesIterator.map(_.trim).toSeq
    def field(name: String): Option[String] =
      lines.find(_.toUpperCase.startsWith(name + ":")).map(_.drop(name.length + 1).trim)
    val status = field("STATUS").map(_.toLowerCase)
      .filter(Set("verified", "contradicted", "uncertain"))
    val conf = field("CONFIDENCE").flatMap(_.toDoubleOption)
      .map(c => math.min(1.0, math.max(0.0, c)))
    (status, conf) match {
      case (Some(s), Some(c)) => Verdict(s, c, field("REASON").getOrElse(""))
      case _ => Verdict("unverifiable", 0.5, "unparseable response")
    }
  }
}
