package graft.context

import java.sql.Timestamp

import graft.Alma
import graft.retrieval.{Modes, PostProcess}

/** 4-layer token-efficient context loading over the engine (reference:
  * alma/context/memory_stack.py:104-530):
  *
  *   L0 identity        — fixed text, always loaded
  *   L1 essential story — top memories by the scoring pipeline, cached
  *   L2 on-demand       — topic recall (short / domain-hinted queries)
  *   L3 deep search     — full retrieval pipeline
  *
  * A driver-side convenience layer: every recall is one `Alma.retrieve`
  * plan; nothing here adds data movement. Time is injected (`asOf`)
  * like everywhere else in the engine.
  */
final class MemoryStack(alma: Alma, agent: String, identity: String = "") {

  import MemoryStack._

  private var essential: Option[String] = None

  /** L0 + L1 (~600-900 tokens), for session start
    * (memory_stack.py:151-204). Caches L1.
    */
  def wakeUp(asOf: Timestamp, domain: Option[String] = None): String = {
    val l1Query = domain.getOrElse("essential context overview")
    val slice = alma.retrieve(l1Query, agent, asOf, topK = 10)
    val story =
      if (slice.totalCount == 0) "## Essential Story\nNo memories available yet.\n"
      else "## Essential Story\n" + slice.toPrompt(maxTokens = EssentialMaxTokens)
    essential = Some(story)
    s"## Identity\n$identity\n\n$story"
  }

  /** Layered recall with the reference's auto-selection: domain hint or
    * a short query goes on-demand (L2), otherwise deep search (L3)
    * (memory_stack.py:206-253).
    */
  def recall(query: String, asOf: Timestamp, layer: Option[Int] = None,
      topK: Int = 5, domain: Option[String] = None): String = {
    val effective = layer.getOrElse(
      if (domain.isDefined || query.length < 30) OnDemand else DeepSearch)
    effective match {
      case Identity => s"## Identity\n$identity"
      case Essential => essential.getOrElse { wakeUp(asOf); essential.get }
      case OnDemand =>
        val q = domain.map(d => s"$d $query").getOrElse(query)
        alma.retrieve(q, agent, asOf, topK, mode = Modes.Precise)
          .toPrompt(maxTokens = OnDemandMaxTokens)
      case _ =>
        alma.retrieve(query, agent, asOf, topK).toPrompt(maxTokens = DeepMaxTokens)
    }
  }

  /** Loaded layers as one token-capped prompt block
    * (memory_stack.py:255-309).
    */
  def toPrompt(maxTokens: Int = 2000): String = {
    val parts = Seq(s"## Identity\n$identity") ++ essential
    val sb = new StringBuilder
    parts.foreach { p =>
      if (PostProcess.estimateTokens(sb.toString + p) <= maxTokens)
        sb.append(p).append("\n")
    }
    sb.toString
  }

  /** Estimated tokens per loaded layer (memory_stack.py:316-343). */
  def tokenUsage: Map[String, Int] = Map(
    "identity" -> PostProcess.estimateTokens(identity),
    "essential" -> essential.map(PostProcess.estimateTokens).getOrElse(0))
}

object MemoryStack {
  val Identity = 0
  val Essential = 1
  val OnDemand = 2
  val DeepSearch = 3

  private val EssentialMaxTokens = 800
  private val OnDemandMaxTokens = 500
  private val DeepMaxTokens = 2000
}
