package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.storage._

/** End-to-end learning cycle (mirror of the reference's
  * tests/e2e/test_learning_cycle.py): learn → promote → retrieve →
  * write-guard → archive/quota → restore.
  */
class AlmaSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshAlma(): Alma = {
    val dir = Files.createTempDirectory("alma-test").toString
    Alma(spark, dir, projectId = "proj1")
  }

  test("learn records outcomes and promotes a heuristic after 3 successes") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", s"deploy service v$i", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val hs = alma.store.heuristics(Some("proj1"), Seq("helena")).collect()
    assert(hs.length == 1)
    assert(hs.head.strategy == "canary rollout")
    assert(hs.head.confidence == 1.0)
    assert(hs.head.occurrenceCount == 3L)
  }

  test("re-promotion refreshes counts and confidence instead of freezing them") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", s"deploy v$i", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    // Two failures then one success with the same strategy: the stored
    // heuristic must reflect the recomputed history, not the first
    // promotion snapshot.
    alma.learn("helena", "deploy", "deploy v4", success = false,
      strategyUsed = "canary rollout", asOf = ts("2024-01-04 10:00:00"))
    alma.learn("helena", "deploy", "deploy v5", success = true,
      strategyUsed = "canary rollout", asOf = ts("2024-01-05 10:00:00"))
    val h = alma.store.heuristics(Some("proj1"), Seq("helena")).collect().head
    assert(h.occurrenceCount == 5L, s"occurrenceCount ${h.occurrenceCount}")
    assert(h.successCount == 4L)
    assert(math.abs(h.confidence - 0.8) < 1e-9)
    assert(math.abs(h.successRate - 0.8) < 1e-9)
  }

  test("a collapsed success ratio demotes the stored heuristic in place") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", s"deploy v$i", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    (4 to 9).foreach { i =>
      alma.learn("helena", "deploy", s"deploy v$i", success = false,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val h = alma.store.heuristics(Some("proj1"), Seq("helena")).collect().head
    assert(h.occurrenceCount == 9L && h.successCount == 3L)
    assert(h.confidence < 0.5, s"confidence ${h.confidence} should reflect the collapse")
  }

  test("no promotion below the occurrence threshold") {
    val alma = freshAlma()
    alma.learn("helena", "deploy", "deploy once", success = true,
      strategyUsed = "big bang", asOf = ts("2024-01-01 10:00:00"))
    assert(alma.store.heuristics(Some("proj1")).isEmpty)
  }

  test("repeated failures with the same error promote an anti-pattern; write guard then blocks") {
    val alma = freshAlma()
    (1 to 2).foreach { i =>
      alma.learn("victor", "migrate", s"migrate shard $i", success = false,
        strategyUsed = "drop and recreate", asOf = ts(s"2024-01-0$i 09:00:00"),
        errorMessage = Some("data loss"))
    }
    val aps = alma.store.antiPatterns(Some("proj1"), Seq("victor")).collect()
    assert(aps.length == 1 && aps.head.occurrenceCount == 2L)
    val err = intercept[IllegalArgumentException] {
      alma.learn("victor", "migrate", "migrate again", success = true,
        strategyUsed = "drop and recreate", asOf = ts("2024-01-03 09:00:00"))
    }
    assert(err.getMessage.contains("write guard"))
  }

  test("retrieve ranks the semantically-matching heuristic first and renders a prompt") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", "deploy the payment service", success = true,
        strategyUsed = "canary rollout with small traffic slice", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    (1 to 3).foreach { i =>
      alma.learn("helena", "ingest", "bulk load parquet files", success = true,
        strategyUsed = "partitioned copy with checkpoints", asOf = ts(s"2024-01-0$i 11:00:00"))
    }
    val slice = alma.retrieve("how should I deploy the payment service",
      "helena", asOf = ts("2024-02-01 00:00:00"), topK = 1)
    assert(slice.heuristics.nonEmpty)
    assert(slice.heuristics.head.strategy.contains("canary"))
    val prompt = slice.toPrompt(400)
    assert(prompt.contains("canary"))
    assert(graft.retrieval.PostProcess.estimateTokens(prompt) <= 400)
  }

  test("a tokenizer trained on stored memories gates the prompt budget") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", "deploy the payment service", success = true,
        strategyUsed = "canary rollout with small traffic slice", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val costOf = alma.tokenizer(numMerges = 16)
    // Trained BPE counts true subwords: more than the chars/4 floor on
    // this short prose, and merge-compressed below raw character count.
    val sample = "deploy the payment service"
    assert(costOf(sample) > graft.retrieval.PostProcess.estimateTokens(sample))
    assert(costOf(sample) < sample.replace(" ", "").length)
    val prompt = alma.retrievePrompt("how should I deploy the payment service",
      "helena", asOf = ts("2024-02-01 00:00:00"), maxTokens = 60, costOf = costOf)
    assert(costOf(prompt) <= 60, s"BPE-budgeted prompt overflows: ${costOf(prompt)}")
    // The budget estimator changes what fits: BPE counts are stricter
    // than chars/4 here, so the BPE-gated prompt can only be shorter.
    val loose = alma.retrievePrompt("how should I deploy the payment service",
      "helena", asOf = ts("2024-02-01 00:00:00"), maxTokens = 60)
    assert(prompt.length <= loose.length)
  }

  test("retrieve runs its five per-type plans as ONE Spark job") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", "deploy the payment service", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE materializes each query stage of the ONE action as its own
    // job id, which would make this count AQE-config-dependent; with it
    // off, one action = one job, which is the claim under test (the
    // pre-fusion code ran five sequential collect actions regardless).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val slice = alma.retrieve("deploy the payment service", "helena",
        ts("2024-02-01 00:00:00"))
      assert(slice.heuristics.nonEmpty && slice.outcomes.nonEmpty)
      // The listener bus is async — wait until the job count is stable.
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val c = jobs.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() == 1, s"fused retrieve launched ${jobs.get()} jobs, expected 1")
  }

  test("scope inheritance: agent reads inherited memories, strangers do not") {
    val dir = Files.createTempDirectory("alma-test").toString
    val scopes = Map(
      "junior" -> MemoryScope("junior", inheritFrom = Set("helena")))
    val alma = new Alma(new MemoryStore(spark, dir), "proj1", scopes)
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", "deploy the api", success = true,
        strategyUsed = "blue green", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val junior = alma.retrieve("deploy the api", "junior", ts("2024-02-01 00:00:00"))
    assert(junior.heuristics.nonEmpty)
    val stranger = alma.retrieve("deploy the api", "mallory", ts("2024-02-01 00:00:00"))
    assert(stranger.heuristics.isEmpty)
  }

  test("quota enforcement archives overflow; restore brings it back") {
    val alma = freshAlma()
    (1 to 5).foreach { i =>
      alma.learn("helena", "task", s"work item $i", success = i % 2 == 0,
        strategyUsed = s"strategy $i", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val archived = alma.enforceQuota(maxOutcomesPerAgent = 2, asOf = ts("2024-02-01 00:00:00"))
    assert(archived == 3)
    assert(alma.store.outcomes(Some("proj1")).count() == 2)
    val archivedIds = alma.store.archivedOutcomes()
      .select("id").collect().map(_.getString(0)).toSet
    assert(archivedIds.size == 3)
    alma.store.restoreOutcomes(archivedIds)
    assert(alma.store.outcomes(Some("proj1")).count() == 5)
  }

  test("archiving every outcome leaves a readable empty store") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "t", s"work $i", success = true,
        strategyUsed = "s", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val archived = alma.enforceQuota(maxOutcomesPerAgent = 0, asOf = ts("2024-02-01 00:00:00"))
    assert(archived == 3)
    // The emptied table must still be readable (no schema-less dir)...
    assert(alma.store.outcomes(Some("proj1")).count() == 0)
    // ...and the write path must keep working afterwards.
    alma.learn("helena", "t", "work again", success = true,
      strategyUsed = "s", asOf = ts("2024-02-02 10:00:00"))
    assert(alma.store.outcomes(Some("proj1")).count() == 1)
  }

  test("mode presets drive top-k and the diversity (MMR) path") {
    val alma = freshAlma()
    for (v <- 1 to 3; i <- 1 to 3) {
      alma.learn("helena", "deploy", s"deploy service variant $v try $i", success = true,
        strategyUsed = s"strategy variant $v", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    // Broad: topK=20 preset, diversity=0.5 → MMR path runs; 3 stored
    // heuristics all come back, deduplicated and ranked.
    val broad = alma.retrieve("deploy service", "helena",
      ts("2024-02-01 00:00:00"), mode = graft.retrieval.Modes.Broad)
    assert(broad.heuristics.size == 3)
    assert(broad.heuristics.map(_.id).distinct.size == 3)
    // Explicit topK overrides the preset.
    val one = alma.retrieve("deploy service", "helena",
      ts("2024-02-01 00:00:00"), topK = 1, mode = graft.retrieval.Modes.Broad)
    assert(one.heuristics.size == 1)
  }

  test("upsert merges occurrence counts by id") {
    val alma = freshAlma()
    val h = Heuristic("h1", "a", "proj1", "cond", "strat", 0.8, 2, 1,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"),
      Array.fill(4)(0.5f), Map.empty)
    alma.store.saveHeuristics(Seq(h))
    alma.store.upsertHeuristics(Seq(h.copy(occurrenceCount = 3, successCount = 2)))
    val merged = alma.store.heuristics().collect().head
    assert(merged.occurrenceCount == 5 && merged.successCount == 3)
  }

  test("retrieval cache: repeat query hits, learn invalidates") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", "deploy the api", success = true,
        strategyUsed = "blue green", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val first = alma.retrieve("deploy the api", "helena", ts("2024-02-01 00:00:00"))
    val second = alma.retrieve("deploy the api", "helena", ts("2024-02-01 00:00:00"))
    // Cached result is the same object graph (no recompute).
    assert(second == first)
    // A new learn invalidates; the next retrieve reflects the write.
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", "deploy the worker", success = true,
        strategyUsed = "rolling restart", asOf = ts(s"2024-01-1$i 10:00:00"))
    }
    val third = alma.retrieve("deploy the api", "helena", ts("2024-02-01 00:00:00"), topK = 5)
    assert(third.heuristics.map(_.strategy).toSet == Set("blue green", "rolling restart"))
  }

  test("batch retrieval matches per-query retrieval, one pass for N queries") {
    val alma = freshAlma()
    for (v <- Seq("payment", "ingest"); i <- 1 to 3) {
      alma.learn("helena", "deploy", s"deploy the $v service attempt $i", success = true,
        strategyUsed = s"$v canary", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val batch = alma.retrieveBatch(
      Seq("deploy the payment service", "deploy the ingest service"),
      "helena", ts("2024-02-01 00:00:00"), topK = 1)
      .collect()
    val topHeuristics = batch
      .filter(r => r.getAs[String]("memory_type") == graft.storage.MemoryType.Heuristics)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[String]("id")).toMap
    val single0 = alma.retrieve("deploy the payment service", "helena",
      ts("2024-02-01 00:00:00"), topK = 1).heuristics.head.id
    val single1 = alma.retrieve("deploy the ingest service", "helena",
      ts("2024-02-01 00:00:00"), topK = 1).heuristics.head.id
    assert(topHeuristics == Map(0L -> single0, 1L -> single1))
  }

  test("recordUsage invalidates cached retrievals (same query+asOf reflects new signals)") {
    val alma = freshAlma()
    for (v <- Seq("alpha", "beta"); i <- 1 to 3) {
      alma.learn("helena", "deploy", s"deploy service $v", success = true,
        strategyUsed = s"$v strategy", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val at = ts("2024-02-01 00:00:00")
    val before = alma.retrieve("deploy service", "helena", at, topK = 2)
    val Seq(top, bottom) = before.heuristics.map(_.id)
    // Usage signals through recordUsage (not recordFeedback): the leader
    // ignored repeatedly, the runner-up used — the IDENTICAL retrieve
    // call must see the flip, not a stale cache hit.
    (1 to 4).foreach { i =>
      alma.recordUsage(Seq(top, bottom), usedIds = Set(bottom),
        MemoryType.Heuristics, "helena", ts(s"2024-02-01 0$i:00:00"))
    }
    val after = alma.retrieve("deploy service", "helena", at, topK = 2)
    assert(after.heuristics.map(_.id) == Seq(bottom, top),
      s"stale cache: ${after.heuristics.map(_.id)} (expected flip to $bottom first)")
  }

  test("two mode configs sharing a preset name never share a cache entry") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", s"deploy v$i", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val at = ts("2024-02-01 00:00:00")
    val loose = graft.retrieval.Modes.Broad
    val strict = loose.copy(minScore = 0.999) // same name, different threshold
    val before = alma.retrieve("deploy", "helena", at, topK = 5, mode = loose)
    assert(before.heuristics.nonEmpty)
    // The stricter config must re-score, not hit the loose config's
    // cached slice (the key carries the full normalized config).
    val after = alma.retrieve("deploy", "helena", at, topK = 5, mode = strict)
    assert(after.heuristics.isEmpty,
      s"cache collision across configs: ${after.heuristics.map(_.id)}")
  }

  test("a writer's knowledge write invalidates inheriting readers' caches") {
    val dir = Files.createTempDirectory("alma-test").toString
    val scopes = Map(
      "writer" -> MemoryScope("writer"),
      "reader" -> MemoryScope("reader", inheritFrom = Set("writer")))
    val alma = Alma(spark, dir, projectId = "proj1", scopes)
    val at = ts("2024-02-01 00:00:00")
    alma.addDomainKnowledge("writer", "deploy", "canary rollouts reduce risk",
      "runbook", 0.9, ts("2024-01-01 10:00:00"))
    val before = alma.retrieve("canary rollout risk", "reader", at, topK = 5)
    assert(before.knowledge.nonEmpty, "reader does not see inherited knowledge")
    // A second write by the WRITER must invalidate the READER's cached
    // slice — the reader's scan includes the writer's rows.
    alma.addDomainKnowledge("writer", "deploy", "canary rollout needs a rollback plan",
      "runbook", 0.9, ts("2024-01-02 10:00:00"))
    val after = alma.retrieve("canary rollout risk", "reader", at, topK = 5)
    assert(after.knowledge.size == before.knowledge.size + 1,
      s"stale reader cache: ${after.knowledge.map(_.fact)}")
  }

  test("recorded feedback signals re-rank retrieval per the 0.15 blend") {
    val alma = freshAlma()
    for (v <- Seq("alpha", "beta"); i <- 1 to 3) {
      alma.learn("helena", "deploy", s"deploy service $v", success = true,
        strategyUsed = s"$v strategy", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    val before = alma.retrieve("deploy service", "helena", ts("2024-02-01 00:00:00"), topK = 2)
    assert(before.heuristics.size == 2)
    val Seq(top, bottom) = before.heuristics.map(_.id)
    // Strong positive signals on the runner-up, negative on the leader:
    // final = 0.85·score + 0.15·(fb+1)/2 swings up to ±0.15 — enough to
    // flip two near-identical candidates.
    (1 to 4).foreach { _ =>
      alma.recordFeedback(bottom, MemoryType.Heuristics, "helena",
        FeedbackSignal.ThumbsUp, ts("2024-02-01 01:00:00"))
      alma.recordFeedback(top, MemoryType.Heuristics, "helena",
        FeedbackSignal.ThumbsDown, ts("2024-02-01 01:00:00"))
    }
    val after = alma.retrieve("deploy service", "helena", ts("2024-02-01 02:00:00"), topK = 2)
    assert(after.heuristics.map(_.id) == Seq(bottom, top),
      s"feedback did not flip the ranking: ${after.heuristics.map(_.id)}")
  }

  test("archive and restore round-trip every memory type") {
    val dir = Files.createTempDirectory("alma-test").toString
    val store = new MemoryStore(spark, dir)
    val t0 = ts("2024-01-01 00:00:00")
    val emb = Array.fill(4)(0.5f)
    store.saveHeuristics(Seq(Heuristic("h1", "a", "p", "c", "s", 0.9, 1, 1, t0, t0, emb, Map.empty)))
    store.saveOutcomes(Seq(Outcome("o1", "a", "p", "t", "d", success = true, "s", 1L, None, t0, emb, Map.empty)))
    store.savePreferences(Seq(UserPreference("u1", "user", "cat", "pref", "src", 0.9, t0, Map.empty)))
    store.saveKnowledge(Seq(DomainKnowledge("k1", "a", "p", "dom", "fact", "src", 0.9, t0, emb, Map.empty)))
    store.saveAntiPatterns(Seq(AntiPattern("ap1", "a", "p", "pat", "why", "alt", 2, t0, t0, emb, Map.empty)))
    val idsByType = Map(
      MemoryType.Heuristics -> "h1", MemoryType.Outcomes -> "o1",
      MemoryType.Preferences -> "u1", MemoryType.Knowledge -> "k1",
      MemoryType.AntiPatterns -> "ap1")
    idsByType.foreach { case (mt, id) =>
      store.archive(mt, Set(id), "test", 42L)
      assert(store.scan(mt).count() == 0, s"$mt still live after archive")
      val arch = store.archived(mt).collect()
      assert(arch.length == 1 && arch.head.getAs[String]("reason") == "test", s"$mt archive row wrong")
      store.restore(mt, Set(id))
      assert(store.scan(mt).count() == 1, s"$mt not restored")
      // Restoring again is a no-op (anti-join dedupe).
      store.restore(mt, Set(id))
      assert(store.scan(mt).count() == 1, s"$mt duplicated by double restore")
    }
  }

  test("stats counts per memory type") {
    val alma = freshAlma()
    alma.learn("helena", "t", "d", success = true, strategyUsed = "s",
      asOf = ts("2024-01-01 00:00:00"))
    val st = alma.store.stats(Some("proj1"))
    assert(st(MemoryType.Outcomes) == 1L)
    assert(st(MemoryType.Heuristics) == 0L)
  }

  test("getStats works once preferences exist (no projectId column there)") {
    val alma = freshAlma()
    alma.addUserPreference("user1", "style", "short answers", "explicit", 0.9,
      asOf = ts("2024-01-01 00:00:00"))
    val st = alma.getStats()
    assert(st(MemoryType.Preferences) == 1L)
    assert(alma.getStats(Some("helena"))(MemoryType.Preferences) == 1L)
  }

  test("thumbs-up feedback never demotes a boosted top result") {
    val alma = freshAlma()
    (1 to 3).foreach { i =>
      alma.learn("helena", "deploy", s"deploy v$i", success = true,
        strategyUsed = "canary rollout", asOf = ts(s"2024-01-0$i 10:00:00"))
      alma.learn("helena", "deploy", s"restart v$i", success = true,
        strategyUsed = "blue green switch", asOf = ts(s"2024-01-0$i 11:00:00"))
    }
    val asOf = ts("2024-02-01 00:00:00")
    val before = alma.retrieve("canary rollout deploy", "helena", asOf).heuristics
    assert(before.nonEmpty)
    val top = before.head.id
    // Perfect feedback on the winner: with the blend applied to the
    // base score (before boosts), endorsement can only help.
    (1 to 4).foreach(_ => alma.recordFeedback(top, MemoryType.Heuristics,
      "helena", FeedbackSignal.ThumbsUp, asOf))
    val after = alma.retrieve("canary rollout deploy", "helena",
      ts("2024-02-01 00:00:01")).heuristics
    assert(after.head.id == top,
      s"endorsed top result was demoted: ${after.map(_.id)}")
  }

  test("recordFeedback rejects unknown signals") {
    val alma = freshAlma()
    intercept[IllegalArgumentException] {
      alma.recordFeedback("m1", MemoryType.Heuristics, "helena", "thumbsup",
        asOf = ts("2024-01-01 00:00:00"))
    }
  }

  test("addUserPreference and addDomainKnowledge persist and retrieve") {
    val alma = freshAlma()
    alma.addUserPreference("user1", "style", "tabs over spaces", "explicit", 0.9,
      asOf = ts("2024-01-01 00:00:00"))
    alma.addDomainKnowledge("helena", "infra", "deploys freeze on fridays", "runbook", 0.8,
      asOf = ts("2024-01-01 00:00:00"))
    assert(alma.store.preferences().collect().head.preference == "tabs over spaces")
    val k = alma.store.knowledge(Some("proj1"), Seq("helena")).collect().head
    assert(k.fact == "deploys freeze on fridays" && k.domain == "infra")
  }

  test("forget prunes stale outcomes and low-confidence heuristics") {
    val alma = freshAlma()
    alma.learn("helena", "t", "old task", success = true, strategyUsed = "s1",
      asOf = ts("2024-01-01 00:00:00"))
    alma.learn("helena", "t", "fresh task", success = true, strategyUsed = "s2",
      asOf = ts("2024-05-01 00:00:00"))
    val t0 = ts("2024-05-01 00:00:00")
    val emb = Array.fill(4)(0.5f)
    alma.store.saveHeuristics(Seq(
      Heuristic("weak", "helena", "proj1", "c", "s", 0.1, 1, 1, t0, t0, emb, Map.empty),
      Heuristic("strong", "helena", "proj1", "c", "s", 0.9, 1, 1, t0, t0, emb, Map.empty)))
    // 90-day window from 2024-05-15: the 2024-01-01 outcome and the 0.1
    // heuristic go; the fresh outcome and the 0.9 heuristic stay.
    val pruned = alma.forget(asOf = ts("2024-05-15 00:00:00"))
    assert(pruned == 2L, s"pruned $pruned")
    assert(alma.store.outcomes(Some("proj1")).collect().map(_.taskDescription).toSeq == Seq("fresh task"))
    assert(alma.store.heuristics(Some("proj1")).collect().map(_.id).toSeq == Seq("strong"))
  }

  test("getStats narrows to one agent") {
    val alma = freshAlma()
    alma.learn("helena", "t", "d1", success = true, strategyUsed = "s",
      asOf = ts("2024-01-01 00:00:00"))
    alma.learn("marcus", "t", "d2", success = true, strategyUsed = "s",
      asOf = ts("2024-01-01 00:00:00"))
    assert(alma.getStats(Some("helena"))(MemoryType.Outcomes) == 1L)
    assert(alma.getStats()(MemoryType.Outcomes) == 2L)
  }

  test("artifact link round-trips through the registry") {
    val alma = freshAlma()
    alma.linkArtifact("mem1", "screenshot", "s3://bucket/shot.png",
      asOf = ts("2024-01-01 00:00:00"), filename = Some("shot.png"),
      sizeBytes = Some(1024L))
    alma.linkArtifact("mem2", "log", "s3://bucket/run.log",
      asOf = ts("2024-01-01 00:00:00"))
    val arts = alma.getArtifacts("mem1")
    assert(arts.length == 1)
    assert(arts.head.storageUrl == "s3://bucket/shot.png")
    assert(arts.head.sizeBytes.contains(1024L))
  }

  test("compaction collapses append fragmentation without losing rows") {
    val alma = freshAlma()
    (1 to 20).foreach { i =>
      alma.learn("helena", "t", s"task $i", success = true, strategyUsed = "s",
        asOf = ts(s"2024-01-${"%02d".format((i % 27) + 1)} 10:00:00"))
    }
    val before = alma.store.outcomes(Some("proj1")).count()
    val filesBefore = alma.maintain(asOf = ts("2024-02-01 00:00:00"),
      olderThanDays = 365)("files_before_compact")
    assert(filesBefore > 16L, s"expected fragmentation, saw $filesBefore files")
    assert(alma.store.outcomes(Some("proj1")).count() == before)
    // A second cycle sees the compacted layout.
    val filesAfter = alma.maintain(asOf = ts("2024-02-01 00:00:00"),
      olderThanDays = 365)("files_before_compact")
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
  }

  test("learnFromWorkflow records the run outcome and validates result") {
    val alma = freshAlma()
    alma.learnFromWorkflow("helena", "wf1", "run1", "success",
      "migrated the schema", asOf = ts("2024-01-01 00:00:00"),
      strategiesUsed = Seq("expand-contract"), nodeCount = Some(7L))
    val w = alma.store.workflowOutcomes(Some("proj1")).collect().head
    assert(w.workflowId == "wf1" && w.result == "success" && w.nodeCount.contains(7L))
    intercept[IllegalArgumentException] {
      alma.learnFromWorkflow("helena", "wf1", "run2", "exploded",
        "bad status", asOf = ts("2024-01-01 00:00:00"))
    }
  }
}
