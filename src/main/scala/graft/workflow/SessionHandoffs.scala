package graft.workflow

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-session continuity records (reference: alma/session/types.py:15-170
  * + session_handoffs table sqlite_local.py:344-372; latest-per-agent
  * read path base.py:885-901). A handoff captures what a session was
  * doing so the next session resumes from it; reads are
  * latest-per-(agent, project) window lookups.
  */
final case class SessionHandoff(
    id: String,
    agent: String,
    projectId: String,
    sessionId: String,
    summary: String,
    openTasks: Seq[String],
    createdAt: Timestamp)

object SessionHandoffs {

  /** Latest handoff per (agent, project) — the resume lookup. */
  def latest(handoffs: Dataset[SessionHandoff]): DataFrame = {
    val w = Window.partitionBy("agent", "projectId")
      .orderBy(col("createdAt").desc, col("id").desc)
    handoffs.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Render a handoff as the resume preamble for the next session
    * (token-capped like every prompt projection).
    */
  def toResumePrompt(h: SessionHandoff, maxTokens: Int): String = {
    import graft.retrieval.PostProcess.estimateTokens
    // The summary itself is budgeted too — a pathological handoff must
    // not blow the next session's context.
    val header = s"# Resuming session for ${h.agent}\n"
    val budgetChars = math.max(0, maxTokens * 4 - header.length - 1)
    val sb = new StringBuilder(header + h.summary.take(budgetChars) + "\n")
    h.openTasks.foreach { t =>
      val line = s"- TODO: $t\n"
      if (estimateTokens(sb.toString + line) <= maxTokens) sb.append(line)
    }
    sb.toString
  }
}
