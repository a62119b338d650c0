package graft.retrieval

/** Driver-side post-processing over an already-collected candidate
  * top-N (≤ ~100 rows): MMR diversity re-ranking, greedy token-budget
  * knapsack, and prompt projection. These are inherently sequential
  * greedy algorithms (SURVEY §7.4), so the correct altitude is
  * distributed candidate generation + driver-side final selection —
  * the candidate set is bounded regardless of corpus size, so this
  * stays O(k²) at 100 TB.
  */
object PostProcess {

  /** One scored candidate (similarity kept separately for MMR's
    * pairwise estimate).
    */
  final case class Candidate(id: Long, score: Double, sim: Double, text: String)

  /** Greedy Maximal-Marginal-Relevance re-ranking (reference:
    * alma/retrieval/engine.py:639-715). Pairwise similarity between two
    * candidates is estimated as sqrt(sim_a * sim_b) — the geometric-mean
    * estimate the reference uses (engine.py:706-715). Deterministic:
    * ties break by candidate id.
    */
  def mmr(candidates: Seq[Candidate], lambda: Double, k: Int): Seq[Candidate] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    val remaining = scala.collection.mutable.ArrayBuffer(candidates.sortBy(c => (-c.score, c.id)): _*)
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.minBy { c =>
        val maxSimToSelected =
          if (selected.isEmpty) 0.0
          else selected.map(sel => math.sqrt(math.max(0.0, c.sim * sel.sim))).max
        (-(c.score - lambda * maxSimToSelected), c.id)
      }
      selected += best
      remaining -= best
    }
    selected.toSeq
  }

  /** chars/4 token estimator (reference: alma/retrieval/budget.py:131-152). */
  def estimateTokens(text: String): Int = math.max(1, text.length / 4)

  /** Pluggable token estimator, the reference's tokenizer-primary /
    * estimator-fallback structure (alma/utils/tokenizer.py:287-310 vs
    * budget.py:131-152): with a trained BPE merge list, counts true
    * subwords; with none, falls back to chars/4. BOTH paths floor at 1
    * here — the raw counters return 0 for pretoken-free text (count_tokens
    * semantics), but a zero-cost candidate would slip through the budget
    * knapsack for free.
    */
  def estimatorFor(merges: Seq[(String, String)]): String => Int =
    if (merges.isEmpty) estimateTokens _
    else text => math.max(1, graft.functions.Bpe.countSubwords(text, merges))

  /** Greedy token-budget selection in score order within tier order
    * (reference: alma/retrieval/budget.py:198-472: MUST_SEE tiers first,
    * then SHOULD_SEE, each capped, total capped). Returns kept candidates
    * in selection order. `costOf` is the token estimator (chars/4 by
    * default; pass `estimatorFor(merges)` for BPE-trained counting).
    */
  def budgetSelect(
      tiers: Seq[Seq[Candidate]],
      perTierTokens: Int,
      totalTokens: Int,
      costOf: String => Int = estimateTokens): Seq[Candidate] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    var totalUsed = 0
    tiers.foreach { tier =>
      var tierUsed = 0
      tier.sortBy(c => (-c.score, c.id)).foreach { c =>
        val t = costOf(c.text)
        if (tierUsed + t <= perTierTokens && totalUsed + t <= totalTokens) {
          kept += c; tierUsed += t; totalUsed += t
        }
      }
    }
    kept.toSeq
  }

  /** Token-capped prompt projection (reference: alma/types.py:278-338
    * MemorySlice.to_prompt): render candidates as a numbered context
    * block, stopping at the token budget.
    */
  def toPrompt(candidates: Seq[Candidate], maxTokens: Int,
      costOf: String => Int = estimateTokens): String = {
    val sb = new StringBuilder("# Relevant memories\n")
    var i = 1
    candidates.foreach { c =>
      val line = s"$i. [${"%.3f".format(c.score)}] ${c.text}\n"
      // Budget against the actual rendered length: summing per-line
      // estimates undercounts vs the estimate of the concatenation
      // (floor division), which would overshoot the cap.
      if (costOf(sb.toString + line) <= maxTokens) { sb.append(line); i += 1 }
    }
    sb.toString
  }
}
