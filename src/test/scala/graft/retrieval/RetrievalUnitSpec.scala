package graft.retrieval

import org.scalatest.funsuite.AnyFunSuite

class RetrievalUnitSpec extends AnyFunSuite {

  test("mode inference picks diagnostic for failure queries") {
    assert(Modes.infer("why did the deploy FAILED again").name == "diagnostic")
  }

  test("mode inference defaults to precise") {
    assert(Modes.infer("how to configure the database").name == "precise")
  }

  test("mode inference finds recall/similarity/broad/learning") {
    assert(Modes.infer("what did we do previously").name == "recall")
    assert(Modes.infer("find similar incidents").name == "similarity")
    assert(Modes.infer("give me an overview").name == "broad")
    assert(Modes.infer("what pattern is emerging").name == "learning")
  }

  test("sanitizer passes short queries through") {
    val q = "what is the capital of France?"
    assert(QuerySanitizer.sanitize(q) == q)
  }

  test("sanitizer extracts the trailing question from pasted context") {
    val noise = "Lorem ipsum dolor sit amet. " * 20
    val q = noise + "What does the error mean?"
    assert(QuerySanitizer.sanitize(q) == "What does the error mean?")
  }

  test("sanitizer falls back to the last sentence") {
    val noise = ("A" * 300) + ". short tail sentence."
    assert(QuerySanitizer.sanitize(noise) == "short tail sentence.")
  }

  test("sanitizer hard-truncates when nothing else applies") {
    val q = "x" * 600
    val out = QuerySanitizer.sanitize(q)
    assert(out.length == QuerySanitizer.TailMax)
  }

  test("MMR diversifies: identical-sim duplicates are demoted") {
    val cs = Seq(
      PostProcess.Candidate(1, 0.9, 0.9, "a"),
      PostProcess.Candidate(2, 0.89, 0.9, "a-dup"),
      PostProcess.Candidate(3, 0.5, 0.1, "b"))
    val out = PostProcess.mmr(cs, lambda = 0.9, k = 2)
    assert(out.map(_.id) == Seq(1, 3))
  }

  test("budget selection honors tier order") {
    val must = Seq(PostProcess.Candidate(1, 0.1, 0, "x" * 40))
    val should = Seq(PostProcess.Candidate(2, 0.99, 0, "x" * 40))
    val kept = PostProcess.budgetSelect(Seq(must, should), perTierTokens = 10, totalTokens = 15)
    // must-tier item (10 tokens) fits first; should-tier then exceeds total.
    assert(kept.map(_.id) == Seq(1))
  }

  test("prompt projection renders numbered lines in order") {
    val cs = Seq(
      PostProcess.Candidate(1, 0.9, 0, "first memory"),
      PostProcess.Candidate(2, 0.8, 0, "second memory"))
    val p = PostProcess.toPrompt(cs, maxTokens = 1000)
    assert(p.contains("1. [0.900] first memory"))
    assert(p.contains("2. [0.800] second memory"))
  }
}
