package graft.retrieval

import org.scalatest.funsuite.AnyFunSuite

/** Reference parity for the per-model budget table and name resolution
  * (alma/utils/tokenizer.py:58-175 table, :477-520 resolution,
  * :423-447 remaining-budget arithmetic).
  */
class ModelBudgetsSpec extends AnyFunSuite {

  test("exact names resolve to their table row") {
    assert(ModelBudgets.resolve("gpt-4").contextWindow == 8192L)
    assert(ModelBudgets.resolve("GPT-4O").memoryBudget == 8000L) // case-folded
    assert(ModelBudgets.resolve("claude-3-opus").memoryBudget == 10000L)
  }

  test("partial match prefers the LONGEST key — gpt-4o-mini-2024 never falls to gpt-4") {
    // A dated release name contains several keys; the reference keeps
    // the longest ("gpt-4o-mini", not "gpt-4o" or "gpt-4").
    assert(ModelBudgets.resolve("gpt-4o-mini-2024-07-18").model == "gpt-4o-mini")
    assert(ModelBudgets.resolve("gpt-4o-2024-08-06").model == "gpt-4o")
    assert(ModelBudgets.resolve("claude-3.5-sonnet-20241022").model == "claude-3.5-sonnet")
    // Reverse containment: a PREFIX of a key matches that key.
    assert(ModelBudgets.resolve("gemini-1.5").model == "gemini-1.5-pro")
  }

  test("unknown models fall back to the default row") {
    val b = ModelBudgets.resolve("my-fine-tune-v7")
    assert(b.model == "default" && b.contextWindow == 8192L)
  }

  test("effective budget applies the 10% safety margin exactly") {
    assert(ModelBudgets.resolve("gpt-4").effectiveMemoryBudget == 1800L)
    assert(ModelBudgets.resolve("claude-3-opus").effectiveMemoryBudget == 9000L)
  }

  test("family ratios match the reference's fallback estimator table") {
    assert(ModelBudgets.resolve("claude-3-haiku").tokensPerChar == 0.28)
    assert(ModelBudgets.resolve("llama-3-8b").tokensPerChar == 0.27)
    assert(ModelBudgets.resolve("gpt-4").tokensPerChar == 0.25)
  }

  test("remaining budget: window minus used minus reserve, margined, clamped") {
    // gpt-4: window 8192, reserve 2048, margin 0.1, effective cap 1800.
    // used=4000 -> (8192-4000-2048)*0.9 = 1929.6 -> 1929, clamped to 1800.
    assert(ModelBudgets.remainingBudget("gpt-4", 4000L) == 1800L)
    // used=5500 -> (8192-5500-2048)*0.9 = 579.6 -> 579 (under the cap).
    assert(ModelBudgets.remainingBudget("gpt-4", 5500L) == 579L)
    // Overcommitted contexts clamp at zero, never negative.
    assert(ModelBudgets.remainingBudget("gpt-4", 9000L) == 0L)
    // Without the response reserve: (8192-5500)*0.9 = 2422.8 -> clamped 1800.
    assert(ModelBudgets.remainingBudget("gpt-4", 5500L,
      includeResponseReserve = false) == 1800L)
  }

  test("the distributed q_token_budget_models dim and this table are one source") {
    assert(ModelBudgets.All.size == 22)
    assert(ModelBudgets.All.map(_.model).distinct.size == 22)
  }
}
