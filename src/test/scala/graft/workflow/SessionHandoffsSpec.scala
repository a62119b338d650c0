package graft.workflow

import java.sql.Timestamp

import graft.SparkSpec

class SessionHandoffsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest handoff per (agent, project) wins by createdAt with id tiebreak") {
    import spark.implicits._
    val hs = Seq(
      SessionHandoff("h1", "helena", "p1", "s1", "old state", Seq("a"), ts("2024-01-01 00:00:00")),
      SessionHandoff("h2", "helena", "p1", "s2", "new state", Seq("b"), ts("2024-01-02 00:00:00")),
      SessionHandoff("h3", "victor", "p1", "s3", "victor state", Seq(), ts("2024-01-01 00:00:00"))).toDS()
    val latest = SessionHandoffs.latest(hs).collect()
      .map(r => r.getAs[String]("agent") -> r.getAs[String]("id")).toMap
    assert(latest == Map("helena" -> "h2", "victor" -> "h3"))
  }

  test("a pathological summary is truncated to the token budget") {
    val h = SessionHandoff("h", "helena", "p1", "s", "x" * 40000, Seq("todo"),
      ts("2024-01-01 00:00:00"))
    val p = SessionHandoffs.toResumePrompt(h, maxTokens = 100)
    assert(graft.retrieval.PostProcess.estimateTokens(p) <= 100)
  }

  test("resume prompt renders summary + capped TODOs") {
    val h = SessionHandoff("h", "helena", "p1", "s", "was migrating shards",
      Seq("finish shard 3", "verify checksums"), ts("2024-01-01 00:00:00"))
    val p = SessionHandoffs.toResumePrompt(h, maxTokens = 100)
    assert(p.contains("was migrating shards") && p.contains("TODO: finish shard 3"))
    assert(graft.retrieval.PostProcess.estimateTokens(p) <= 100)
  }
}
