package graft.context

import java.nio.file.Files
import java.sql.Timestamp

import graft.{Alma, SparkSpec}
import graft.storage.MemoryStore

/** 4-layer context stack: wake-up caching, layered recall routing, and
  * token accounting.
  */
class MemoryStackSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val alma = {
    val dir = Files.createTempDirectory("stack-test").toString
    val a = new Alma(new MemoryStore(spark, dir), "proj1")
    (1 to 3).foreach { i =>
      a.learn("helena", "deploy", s"deploy service v$i", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    a
  }

  private val asOf = ts("2024-02-01 00:00:00")

  test("wake_up returns identity + essential story and caches L1") {
    val stack = new MemoryStack(alma, "helena", identity = "deploy agent for proj1")
    val ctx = stack.wakeUp(asOf)
    assert(ctx.startsWith("## Identity\ndeploy agent for proj1"))
    assert(ctx.contains("## Essential Story"))
    assert(ctx.contains("canary rollout"))
    // L1 recall serves the cached story without another retrieve.
    assert(stack.recall("anything", asOf, layer = Some(MemoryStack.Essential))
      .contains("canary rollout"))
    assert(stack.tokenUsage("essential") > 0)
  }

  test("recall auto-routes: short query on-demand, long query deep") {
    val stack = new MemoryStack(alma, "helena")
    val short = stack.recall("deploy", asOf)
    assert(short.contains("canary rollout"))
    val long = stack.recall(
      "what is the established strategy for deploying the api service safely", asOf)
    assert(long.contains("canary rollout"))
  }

  test("empty store wakes up with a no-memories story") {
    val dir = Files.createTempDirectory("stack-empty").toString
    val empty = new Alma(new MemoryStore(spark, dir), "proj2")
    val stack = new MemoryStack(empty, "nobody")
    assert(stack.wakeUp(asOf).contains("No memories available yet"))
  }

  test("toPrompt caps at the token budget") {
    val stack = new MemoryStack(alma, "helena", identity = "x" * 100)
    stack.wakeUp(asOf)
    val tight = stack.toPrompt(maxTokens = 30)
    assert(graft.retrieval.PostProcess.estimateTokens(tight) <= 31)
  }
}
