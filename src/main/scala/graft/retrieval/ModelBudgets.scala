package graft.retrieval

/** Per-model token-budget table + name resolution (reference:
  * alma/utils/tokenizer.py:35-54 ModelTokenBudget /
  * :58-175 DEFAULT_TOKEN_BUDGETS / :477-520 get_default_token_budget).
  * The same rows drive `q_token_budget_models`' distributed knapsack
  * (operators/Lifecycle.scala); this is the driver-side lookup seam a
  * caller uses to pick ONE budget before planning a prompt.
  */
object ModelBudgets {

  /** One row of the reference's DEFAULT_TOKEN_BUDGETS: family feeds the
    * fallback chars→tokens ratio (tokenizer.py:195-205); effective
    * budget applies the 10% safety margin (tokenizer.py:52-54).
    */
  final case class ModelBudget(
      model: String,
      family: String,
      contextWindow: Long,
      memoryBudget: Long,
      responseReserve: Long) {
    val safetyMargin: Double = 0.1
    /** int(memory_budget * (1 - safety_margin)) — exact in integer math
      * because every table budget is divisible by 10.
      */
    def effectiveMemoryBudget: Long = memoryBudget * 9 / 10
    /** The family's fallback tokens-per-char ratio. */
    def tokensPerChar: Double = family match {
      case "claude" => 0.28
      case "llama" | "mistral" => 0.27
      case _ => 0.25
    }
  }

  /** The reference table, verbatim (tokenizer.py:58-175). */
  val All: Seq[ModelBudget] = Seq(
    ModelBudget("gpt-4", "gpt4", 8192L, 2000L, 2048L),
    ModelBudget("gpt-4-32k", "gpt4", 32768L, 4000L, 4096L),
    ModelBudget("gpt-4-turbo", "gpt4", 128000L, 8000L, 4096L),
    ModelBudget("gpt-4o", "gpt4", 128000L, 8000L, 4096L),
    ModelBudget("gpt-4o-mini", "gpt4", 128000L, 8000L, 4096L),
    ModelBudget("gpt-3.5-turbo", "gpt35", 16385L, 2000L, 2048L),
    ModelBudget("gpt-3.5-turbo-16k", "gpt35", 16385L, 4000L, 4096L),
    ModelBudget("claude-3-opus", "claude", 200000L, 10000L, 4096L),
    ModelBudget("claude-3-sonnet", "claude", 200000L, 8000L, 4096L),
    ModelBudget("claude-3-haiku", "claude", 200000L, 6000L, 4096L),
    ModelBudget("claude-3.5-sonnet", "claude", 200000L, 8000L, 4096L),
    ModelBudget("claude-3.5-haiku", "claude", 200000L, 6000L, 4096L),
    ModelBudget("gemini-pro", "gemini", 32768L, 4000L, 4096L),
    ModelBudget("gemini-1.5-pro", "gemini", 1000000L, 10000L, 8192L),
    ModelBudget("gemini-1.5-flash", "gemini", 1000000L, 8000L, 8192L),
    ModelBudget("llama-2-7b", "llama", 4096L, 1000L, 1024L),
    ModelBudget("llama-2-70b", "llama", 4096L, 1000L, 1024L),
    ModelBudget("llama-3-8b", "llama", 8192L, 2000L, 2048L),
    ModelBudget("llama-3-70b", "llama", 8192L, 2000L, 2048L),
    ModelBudget("mistral-7b", "mistral", 8192L, 2000L, 2048L),
    ModelBudget("mixtral-8x7b", "mistral", 32768L, 4000L, 4096L),
    ModelBudget("default", "unknown", 8192L, 2000L, 2048L))

  private val byName: Map[String, ModelBudget] = All.map(b => b.model -> b).toMap
  private val default: ModelBudget = byName("default")

  /** Reference name resolution (tokenizer.py:477-520): exact match
    * first; then the LONGEST partial match in either direction (a key
    * contained in the name, or the name contained in a key — longer
    * keys win so "gpt-4o" never loses to "gpt-4"); else the default.
    */
  def resolve(model: String): ModelBudget = {
    val m = model.toLowerCase
    byName.get(m).getOrElse {
      val candidates = All.filter(_.model != "default").flatMap { b =>
        if (m.contains(b.model)) Some((b.model.length, b))
        else if (b.model.contains(m)) Some((m.length, b))
        else None
      }
      // Stable longest-match: ties break by table order like the
      // reference's dict-iteration `>` comparison keeps the first.
      if (candidates.isEmpty) default else candidates.maxBy(_._1)._2
    }
  }

  /** estimate_remaining_budget (tokenizer.py:423-447): window minus
    * used (minus the response reserve when asked), safety-margined,
    * clamped into [0, effective memory budget].
    */
  def remainingBudget(model: String, usedTokens: Long,
      includeResponseReserve: Boolean = true): Long = {
    val b = resolve(model)
    var available = b.contextWindow - usedTokens
    if (includeResponseReserve) available -= b.responseReserve
    available = (available * (1 - b.safetyMargin)).toLong
    math.max(0L, math.min(available, b.effectiveMemoryBudget))
  }
}
