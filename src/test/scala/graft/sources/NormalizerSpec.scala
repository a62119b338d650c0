package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Format detection + normalization fixtures per supported export
  * format (mirror of the reference's normalizer tests).
  */
class NormalizerSpec extends SparkSpec {

  private val transcript = "> how do I join\nuse a hash join\n> and sort\nsort merge\n> ok\n"

  private val claudeCode =
    """{"type": "user", "message": {"content": "fix the bug"}}
      |{"type": "assistant", "message": {"content": [{"type": "text", "text": "done, pushed"}]}}
      |{"type": "user", "message": {"content": "thanks"}}""".stripMargin

  private val codex =
    """{"type": "session_meta", "payload": {}}
      |{"type": "event_msg", "payload": {"type": "user_message", "message": "run tests"}}
      |{"type": "event_msg", "payload": {"type": "agent_message", "message": "183 green"}}""".stripMargin

  private val claudeAi =
    """{"messages": [
      |  {"role": "user", "content": "what is spark"},
      |  {"role": "assistant", "content": "a distributed engine"}]}""".stripMargin

  private val chatgpt =
    """{"mapping": {
      |  "root": {"parent": null, "message": null, "children": ["m1"]},
      |  "m1": {"parent": "root", "children": ["m2"],
      |    "message": {"author": {"role": "user"}, "content": {"parts": ["hello there"]}}},
      |  "m2": {"parent": "m1", "children": [],
      |    "message": {"author": {"role": "assistant"}, "content": {"parts": ["hi, ask away"]}}}}}""".stripMargin

  private val slack =
    """[{"type": "message", "user": "alice", "text": "deploy ready?"},
      | {"type": "message", "user": "bob", "text": "yes, shipping"},
      | {"type": "message", "user": "alice", "text": "great"}]""".stripMargin

  test("detectFormat classifies every fixture") {
    import spark.implicits._
    val fixtures = Seq(
      transcript -> "transcript", claudeCode -> "claude_code_jsonl",
      codex -> "codex_jsonl", claudeAi -> "claude_ai_json",
      chatgpt -> "chatgpt_json", slack -> "slack_json",
      "plain words only" -> "plain_text")
    val got = fixtures.map(_._1).toDF("content")
      .select(col("content"), Normalizer.detectFormat(col("content")).as("fmt"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fixtures.foreach { case (content, want) => assert(got(content) == want, want) }
  }

  test("transcript passes through unchanged") {
    assert(Normalizer.normalizeText(transcript) == transcript)
  }

  test("claude code jsonl normalizes with text-block extraction") {
    val out = Normalizer.normalizeText(claudeCode)
    assert(out == "> fix the bug\ndone, pushed\n\n> thanks\n")
  }

  test("codex jsonl requires session_meta and pairs turns") {
    assert(Normalizer.normalizeText(codex) == "> run tests\n183 green\n")
    val noMeta = codex.split("\n").drop(1).mkString("\n")
    assert(Normalizer.normalizeText(noMeta) == noMeta) // pass-through
  }

  test("claude.ai json flat messages normalize") {
    assert(Normalizer.normalizeText(claudeAi) == "> what is spark\na distributed engine\n")
  }

  test("chatgpt mapping tree walks root chain") {
    assert(Normalizer.normalizeText(chatgpt) == "> hello there\nhi, ask away\n")
  }

  test("slack alternating speakers become user/assistant") {
    assert(Normalizer.normalizeText(slack) ==
      "> deploy ready?\nyes, shipping\n\n> great\n")
  }

  test("normalized transcript feeds the exchange chunker") {
    val out = Normalizer.normalizeText(claudeCode)
    val turns = out.split("\n").filter(_.nonEmpty).map { l =>
      if (l.startsWith("> ")) ("user", l.drop(2)) else ("assistant", l)
    }.toSeq
    val exchanges = Ingestion.chunkExchanges(turns, minChars = 5)
    assert(exchanges.head == "Q: fix the bug\nA: done, pushed")
  }

  test("normalizeDocuments adds fmt and transcript columns") {
    import spark.implicits._
    val df = Seq((1L, claudeAi), (2L, "plain words only")).toDF("id", "content")
    val out = Normalizer.normalizeDocuments(df, "content")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(out(1L)._1 == "claude_ai_json")
    assert(out(1L)._2 == "> what is spark\na distributed engine\n")
    assert(out(2L) == ("plain_text", "plain words only"))
  }
}
