package graft.functions

import graft.SparkSpec
import graft.retrieval.Verification
import org.apache.spark.sql.functions._

/** O12 external-call stage: token-bucket pacing (proved with an
  * injected clock, no real sleeps), the distributed rate-limited call
  * stage, and the pluggable verification path.
  */
class ExternalCallSpec extends SparkSpec {

  test("token bucket paces to N calls per period (injected clock)") {
    var now = 0L
    var slept = 0L
    val bucket = new TokenBucket(2, 1000L,
      clock = () => now,
      sleeper = w => { slept += w; now += w })
    (1 to 5).foreach(_ => bucket.acquire())
    // 2 calls free at t=0; 3rd waits out the window to t=1000 and takes
    // slot 1 of the new window; 4th takes slot 2; 5th waits to t=2000.
    assert(now == 2000L, s"simulated clock = $now")
    assert(slept == 2000L, s"slept = $slept")
  }

  test("token bucket resets its window after an idle gap without sleeping") {
    var now = 0L
    var slept = 0L
    val bucket = new TokenBucket(1, 1000L,
      clock = () => now,
      sleeper = w => { slept += w; now += w })
    bucket.acquire()
    now = 5000L // idle past the window: next acquire must not sleep
    bucket.acquire()
    assert(slept == 0L, s"slept = $slept")
  }

  test("token bucket never grants more than N calls inside any window (randomized)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val calls = 1 + rnd.nextInt(5)
      val period = 100L + rnd.nextInt(900)
      var now = 0L
      val bucket = new TokenBucket(calls, period,
        clock = () => now,
        sleeper = w => now += w)
      val grants = (1 to 50).map { _ =>
        // jittered arrivals, including bursts (zero gap)
        now += rnd.nextInt(3) * (period / 4)
        bucket.acquire()
        now
      }
      // The reference algorithm (rate_limit.py:49-77) is a FIXED-window
      // limiter: windows are anchored at construction time and re-anchor
      // at the reset that follows each rollover — NOT at each first
      // grant, so a late grant in one window plus an early grant in the
      // next can sit closer than `period` apart. Mirror that exact
      // anchoring here and assert its invariant: ≤ N grants per window.
      var windowStart = 0L
      var inWindow = 0
      grants.foreach { t =>
        if (t - windowStart >= period) { windowStart = t; inWindow = 1 }
        else inWindow += 1
        assert(inWindow <= calls,
          s"calls=$calls period=$period: $inWindow grants inside one window")
      }
    }
  }

  test("concurrent threads sharing one bucket are paced together") {
    // The executor scenario: multiple partition tasks, one per-JVM
    // bucket. 2 calls per 200 ms and 6 acquisitions from 3 threads
    // must span at least two full window rollovers (~400 ms).
    val bucket = new TokenBucket(2, 200L)
    val t0 = System.nanoTime()
    val threads = (1 to 3).map { _ =>
      new Thread(() => { bucket.acquire(); bucket.acquire() })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(10000))
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs >= 380, s"6 acquires at 2/200ms finished in ${elapsedMs}ms")
  }

  test("registry shares one bucket per key within the JVM") {
    val a = TokenBucket.forKey("spec-shared", 10, 1000L)
    val b = TokenBucket.forKey("spec-shared", 10, 1000L)
    assert(a eq b)
    assert(!(a eq TokenBucket.forKey("spec-other", 10, 1000L)))
  }

  test("callStage runs the completer distributed and keeps ids aligned") {
    import spark.implicits._
    val prompts = (0L until 20L).map(i => (i, s"prompt $i")).toDF("id", "prompt")
      .repartition(4)
    val completer = new ExternalCompleter {
      def complete(prompt: String): String = s"echo[$prompt]"
    }
    val out = ExternalCall.callStage(prompts, "id", "prompt", completer,
        limiterKey = "spec-call", callsPerPeriod = 1000, periodMillis = 60000L)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.length == 20)
    assert(out.forall { case (id, resp) => resp == s"echo[prompt $id]" })
  }

  test("parseVerdict handles the response contract and malformed replies") {
    val ok = ExternalCall.parseVerdict(
      "STATUS: contradicted\nCONFIDENCE: 0.9\nREASON: source disagrees")
    assert(ok == ExternalCall.Verdict("contradicted", 0.9, "source disagrees"))
    val clamped = ExternalCall.parseVerdict("STATUS: verified\nCONFIDENCE: 7.5\nREASON: x")
    assert(clamped.confidence == 1.0)
    val bad = ExternalCall.parseVerdict("I am not following instructions today")
    assert(bad == ExternalCall.Verdict("unverifiable", 0.5, "unparseable response"))
    val badStatus = ExternalCall.parseVerdict("STATUS: maybe\nCONFIDENCE: 0.4")
    assert(badStatus.status == "unverifiable")
  }

  test("externalVerify accepts a pluggable verifier end-to-end") {
    import spark.implicits._
    val memories = Seq(
      (1L, "the deploy failed on tuesday"),
      (2L, "bad fact that contradicts the sources"),
      (3L, "retry with exponential backoff")).toDF("mem_id", "content")
    // A deterministic "model": contradicts anything containing "bad".
    val completer = new ExternalCompleter {
      def complete(prompt: String): String =
        if (prompt.contains("bad")) "STATUS: contradicted\nCONFIDENCE: 0.95\nREASON: conflicts"
        else "STATUS: verified\nCONFIDENCE: 0.8\nREASON: consistent"
    }
    val out = Verification.externalVerify(
        memories, "mem_id", "content", Seq("source A", "source B"), completer,
        limiterKey = "spec-verify")
      .orderBy("mem_id")
      .select("mem_id", "status", "confidence")
      .as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "verified", 0.8), (2L, "contradicted", 0.95), (3L, "verified", 0.8)))
  }

  test("mergeStage renders one deterministic prompt per consolidation group") {
    import spark.implicits._
    val members = Seq(
      (1L, "deploy", "canary", 0.9, 3L),
      (1L, "deploy", "blue-green", 0.7, 2L),
      (2L, "ingest", "bulk copy", 0.8, 5L)).toDF(
      "group_id", "condition", "strategy", "confidence", "occurrences")
      .repartition(3)
    val completer = new ExternalCompleter {
      def complete(prompt: String): String = s"merged ${prompt.count(_ == ':')}"
    }
    val out = ExternalCall.mergeStage(members, completer, limiterKey = "spec-merge")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // 5 colons per member block (header + 4 field labels): group 1 has
    // 2 members, group 2 has 1.
    assert(out == Seq((1L, "merged 10"), (2L, "merged 5")))
  }

  test("verify and merge prompt renderers produce the reference shape") {
    val vp = ExternalCall.verifyPrompt("fact", Seq("s1", "s2", "s3"), maxSources = 2)
    assert(vp.contains("- s1") && vp.contains("- s2") && !vp.contains("- s3"))
    assert(vp.contains("STATUS: verified|contradicted|uncertain"))
    val mp = ExternalCall.mergePrompt(Seq(("cond", "strat", 0.75, 3L)))
    assert(mp.contains("Heuristic 1:") && mp.contains("Confidence: 0.75")
      && mp.contains("Occurrences: 3"))
  }
}
