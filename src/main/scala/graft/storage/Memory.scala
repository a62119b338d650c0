package graft.storage

import java.sql.Timestamp

/** Typed memory records — the five collections of the reference's data
  * model (reference: alma/types.py:144-252), as case classes with Spark
  * Encoders. Embeddings are a column on the record itself (Spark is
  * columnar — no FAISS side table, SURVEY §1.4), metadata is a string
  * map.
  */
final case class Heuristic(
    id: String,
    agent: String,
    projectId: String,
    condition: String,
    strategy: String,
    confidence: Double,
    occurrenceCount: Long,
    successCount: Long,
    lastValidated: Timestamp,
    createdAt: Timestamp,
    embedding: Array[Float],
    metadata: Map[String, String]) {
  /** Derived success rate (alma/types.py:165-170). */
  def successRate: Double =
    if (occurrenceCount == 0) 0.0 else successCount.toDouble / occurrenceCount
}

final case class Outcome(
    id: String,
    agent: String,
    projectId: String,
    taskType: String,
    taskDescription: String,
    success: Boolean,
    strategyUsed: String,
    durationMs: Long,
    errorMessage: Option[String],
    timestamp: Timestamp,
    embedding: Array[Float],
    metadata: Map[String, String])

final case class UserPreference(
    id: String,
    userId: String,
    category: String,
    preference: String,
    source: String,
    confidence: Double,
    timestamp: Timestamp,
    metadata: Map[String, String])

final case class DomainKnowledge(
    id: String,
    agent: String,
    projectId: String,
    domain: String,
    fact: String,
    source: String,
    confidence: Double,
    lastVerified: Timestamp,
    embedding: Array[Float],
    metadata: Map[String, String])

final case class AntiPattern(
    id: String,
    agent: String,
    projectId: String,
    pattern: String,
    whyBad: String,
    betterAlternative: String,
    occurrenceCount: Long,
    lastSeen: Timestamp,
    createdAt: Timestamp,
    embedding: Array[Float],
    metadata: Map[String, String])

/** Per-retrieval usage signal (reference retrieval_feedback table,
  * alma/types.py:352-379): used / ignored / thumbs_up / thumbs_down
  * recorded against a memory id, aggregated into the R10 re-rank blend.
  */
final case class RetrievalFeedback(
    id: String,
    memoryId: String,
    memoryType: String,
    agent: String,
    projectId: String,
    signal: String,
    timestamp: Timestamp)

object FeedbackSignal {
  val Used = "used"
  val Ignored = "ignored"
  val ThumbsUp = "thumbs_up"
  val ThumbsDown = "thumbs_down"
}

/** External artifact reference (reference: alma/workflow/artifacts.py +
  * core.py:744-830 link_artifact/get_artifacts): artifacts live in
  * object storage; memories carry URLs + integrity metadata only.
  */
final case class ArtifactRef(
    id: String,
    memoryId: String,
    artifactType: String,
    storageUrl: String,
    filename: Option[String],
    mimeType: Option[String],
    sizeBytes: Option[Long],
    checksum: Option[String],
    createdAt: Timestamp,
    metadata: Map[String, String])

/** Workflow-level outcome (reference: alma/workflow/outcome.py model,
  * core.py:652-741 learn_from_workflow): what a whole run learned —
  * result status, strategies, and pattern lists.
  */
final case class WorkflowOutcome(
    id: String,
    agent: String,
    projectId: String,
    workflowId: String,
    runId: String,
    result: String,
    summary: String,
    strategiesUsed: Seq[String],
    successfulPatterns: Seq[String],
    failedPatterns: Seq[String],
    durationSeconds: Option[Double],
    nodeCount: Option[Long],
    errorMessage: Option[String],
    createdAt: Timestamp,
    metadata: Map[String, String])

/** Memory type discriminators (alma/types.py:16-23). */
object MemoryType {
  val Heuristics = "heuristics"
  val Outcomes = "outcomes"
  val Preferences = "preferences"
  val Knowledge = "knowledge"
  val AntiPatterns = "anti_patterns"
  /** Side tables (not memory collections): feedback log, artifact
    * registry, workflow outcomes.
    */
  val Feedback = "retrieval_feedback"
  val Artifacts = "artifacts"
  val WorkflowOutcomes = "workflow_outcomes"
  val Checkpoints = "checkpoints"
  val All: Seq[String] = Seq(Heuristics, Outcomes, Preferences, Knowledge, AntiPatterns)

  /** Every stored table, side tables included — the maintenance set.
    * The append-heaviest tables (feedback: one row per retrieved memory
    * per recordUsage; checkpoints: one per workflow step) are side
    * tables, so a maintenance loop over `All` alone would skip exactly
    * the tables that fragment fastest.
    */
  val AllStored: Seq[String] =
    All ++ Seq(Feedback, Artifacts, WorkflowOutcomes, Checkpoints)
}

/** Per-agent access scope (alma/types.py:26-85): row-level predicates on
  * every read, write-guard on every learn.
  */
final case class MemoryScope(
    agent: String,
    canLearn: Set[String] = Set.empty,
    cannotLearn: Set[String] = Set.empty,
    shareWith: Set[String] = Set.empty,
    inheritFrom: Set[String] = Set.empty,
    minOccurrencesForHeuristic: Int = 3) {

  /** Deny-list beats allow-list; empty allow = everything
    * (alma/types.py:46-52).
    */
  def isAllowed(domain: String): Boolean =
    !cannotLearn.contains(domain) && (canLearn.isEmpty || canLearn.contains(domain))

  /** Agents whose memories this scope may read. */
  def readableAgents: Seq[String] = (inheritFrom + agent).toSeq.sorted
}

/** The assembled retrieval result (alma/types.py:255-349). */
final case class MemorySlice(
    heuristics: Seq[Heuristic],
    outcomes: Seq[Outcome],
    preferences: Seq[UserPreference],
    knowledge: Seq[DomainKnowledge],
    antiPatterns: Seq[AntiPattern],
    query: String,
    agent: String) {

  def totalCount: Int =
    heuristics.size + outcomes.size + preferences.size + knowledge.size + antiPatterns.size

  /** Token-budget-capped prompt projection (alma/types.py:278-338).
    * `costOf` is the token estimator — chars/4 by default, or
    * `PostProcess.estimatorFor(merges)` for BPE-trained subword
    * counting (the reference's tokenizer-primary slot).
    */
  def toPrompt(maxTokens: Int,
      costOf: String => Int = graft.retrieval.PostProcess.estimateTokens): String = {
    def estimateTokens(s: String): Int = costOf(s)
    val sections: Seq[(String, Seq[String])] = Seq(
      "## User preferences" -> preferences.map(p => s"- ${p.preference}"),
      "## Avoid (anti-patterns)" -> antiPatterns.map(a => s"- ${a.pattern}: ${a.betterAlternative}"),
      "## Heuristics" -> heuristics.map(h => s"- when ${h.condition}: ${h.strategy} (${"%.2f".format(h.confidence)})"),
      "## Past outcomes" -> outcomes.map(o => s"- [${if (o.success) "ok" else "FAIL"}] ${o.taskDescription}"),
      "## Knowledge" -> knowledge.map(k => s"- ${k.fact}"))
    val sb = new StringBuilder(s"# Memory for $agent\n")
    sections.foreach { case (header, lines) =>
      if (lines.nonEmpty) {
        val block = header + "\n" + lines.mkString("\n") + "\n"
        if (estimateTokens(sb.toString + block) <= maxTokens) sb.append(block)
      }
    }
    sb.toString
  }
}
