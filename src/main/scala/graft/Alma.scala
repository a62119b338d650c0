package graft

import java.sql.Timestamp
import java.util.UUID

import java.security.MessageDigest

import graft.functions.{HashEmbedder, VectorFunctions}
import graft.retrieval.{ModeConfig, Modes, PostProcess, QuerySanitizer, RetrievalCache}
import graft.storage._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing engine facade — the reference's `ALMA` core API
  * re-expressed Spark-first (reference: alma/core.py:246-380:
  * retrieve + learn; alma/retrieval/engine.py:158-374 read path;
  * alma/learning/protocols.py:59-279 write path + promotions;
  * alma/learning/decay.py / forgetting.py:441-515 maintenance).
  *
  * All similarity/scoring/top-k run as one declarative plan per memory
  * type; only the final ≤ top-k rows are collected into the MemorySlice.
  * Time is always injected (`asOf`), never read from the wall clock.
  */
final class Alma(
    val store: MemoryStore,
    val projectId: String,
    scopes: Map[String, MemoryScope] = Map.empty,
    embedDim: Int = HashEmbedder.Dim) {

  private val spark = store.spark
  import spark.implicits._

  private def scope(agent: String): MemoryScope =
    scopes.getOrElse(agent, MemoryScope(agent))

  // O5: retrieval-result cache, invalidated per (agent, project) on
  // every learn (reference: cache.py:363-737 + core.py:358-359). The
  // cache clock is the injected asOf — deterministic like everything
  // else here.
  private val cache = new RetrievalCache[MemorySlice]()

  private def cacheNamespace(agent: String): String = s"$agent|$projectId"

  /** Driver-side event pub/sub (reference alma/events/emitter.py):
    * facade writes emit bounded control-plane notifications here;
    * attach a `WebhookManager` via `events.subscribeAll`/`start` for
    * the reference's webhook surface. Off by default (no subscribers =
    * no work).
    */
  val events = new graft.events.EventEmitter

  private def now(asOf: Timestamp) = asOf

  // ---- §3.2 the write path ---------------------------------------------
  /** Record a task outcome; promote heuristics / anti-patterns when the
    * thresholds are met (A1: ≥3 occurrences and >0.5 success ratio;
    * A2: ≥2 similar failures — protocols.py:163-279).
    */
  def learn(
      agent: String,
      taskType: String,
      taskDescription: String,
      success: Boolean,
      strategyUsed: String,
      asOf: Timestamp,
      durationMs: Long = 0L,
      errorMessage: Option[String] = None,
      context: Option[graft.workflow.WorkflowContext] = None): Outcome = {
    context.foreach(_.validate())
    // F10 write guard: learning a strategy that matches a stored
    // anti-pattern is refused.
    val guard = store.antiPatterns(Some(projectId), scope(agent).readableAgents)
      .filter(col("pattern") === strategyUsed).count()
    require(guard == 0, s"write guard: strategy '$strategyUsed' matches a stored anti-pattern")

    val o = Outcome(
      id = UUID.randomUUID().toString,
      agent = agent, projectId = projectId,
      taskType = taskType, taskDescription = taskDescription,
      success = success, strategyUsed = strategyUsed,
      durationMs = durationMs, errorMessage = errorMessage,
      timestamp = now(asOf),
      embedding = HashEmbedder.embed(s"$taskDescription $strategyUsed", embedDim),
      // Workflow-scoped learns stamp their coordinates so that
      // retrieveWithScope can filter on them (context.py pairing).
      metadata = context.fold(Map.empty[String, String])(_.toStamp))
    store.saveOutcomes(Seq(o))
    events.emit(graft.events.MemoryEvent(
      graft.events.MemoryEventType.Created, agent, projectId,
      MemoryType.Outcomes, o.id, asOf.getTime * 1000L,
      Map("task_type" -> taskType, "success" -> success.toString)))
    promoteHeuristics(agent, taskType, asOf)
    if (!success) promoteAntiPatterns(agent, asOf)
    invalidateCacheFor(agent)
    o
  }

  /** Write-triggered invalidation: the writing agent's cached
    * retrievals are stale, as are those of any agent whose scope
    * inherits from it (their scans include the writer's rows via
    * `readableAgents`) — every agent-scoped write path must use this,
    * not a single-namespace invalidation.
    */
  private def invalidateCacheFor(agent: String): Unit = {
    val affected = agent +: scopes.collect {
      case (reader, sc) if sc.inheritFrom.contains(agent) => reader
    }.toSeq
    affected.foreach(a =>
      cache.invalidateWhere(_.startsWith(cache.nsPrefix(cacheNamespace(a)))))
  }

  /** A1 heuristic promotion over recent outcomes of this task type.
    * New heuristics require the promotion threshold; existing ones are
    * ALWAYS refreshed from the recomputed stats, so a strategy whose
    * success ratio later collapses is demoted in place rather than
    * frozen at its last promoted confidence.
    *
    * Fully distributed: the per-strategy stats aggregate maps straight
    * into Heuristic rows on the executors and merges into storage as a
    * full-outer join (MemoryStore.mergeHeuristics) — counts are
    * recomputed from the full outcome history, so matched rows are
    * REPLACED (deterministic ids make this idempotent); incrementing
    * would double-count. The promotion threshold gates NEW rows only.
    */
  private def promoteHeuristics(agent: String, taskType: String, asOf: Timestamp): Unit = {
    val (pid, dim, ag, tt) = (projectId, embedDim, agent, taskType)
    val incoming = store.outcomes(Some(projectId), Seq(agent))
      .filter(col("taskType") === taskType)
      .groupBy("strategyUsed")
      .agg(count(lit(1)).as("n"),
        sum(when(col("success"), 1L).otherwise(0L)).as("succ"))
      .as[(String, Long, Long)]
      .map { case (strategy, n, succ) =>
        Heuristic(
          id = s"h-$pid-$ag-$tt-${Alma.idHash(strategy)}",
          agent = ag, projectId = pid,
          condition = tt, strategy = strategy,
          confidence = succ.toDouble / n,
          occurrenceCount = n, successCount = succ,
          lastValidated = asOf, createdAt = asOf,
          embedding = HashEmbedder.embed(s"$tt $strategy", dim),
          metadata = Map.empty)
      }.toDF()
    store.mergeHeuristics(incoming, addCounts = false,
      insertFilter = Some(col("occurrenceCount") >= scope(agent).minOccurrencesForHeuristic &&
        col("confidence") > 0.5))
  }

  /** A2 anti-pattern promotion: ≥2 failures with the same error class.
    * Distributed like promoteHeuristics: aggregate → typed map → anti-
    * join against stored ids → append (insert-only; promoted patterns
    * are never weakened by later successes).
    */
  private def promoteAntiPatterns(agent: String, asOf: Timestamp): Unit = {
    val (pid, dim, ag) = (projectId, embedDim, agent)
    val candidates = store.outcomes(Some(projectId), Seq(agent))
      .filter(!col("success") && col("errorMessage").isNotNull)
      .groupBy(col("errorMessage"))
      .agg(count(lit(1)).as("n"),
        min_by(col("strategyUsed"), struct(col("timestamp"), col("id"))).as("strategy"))
      .filter(col("n") >= 2)
      .as[(String, Long, String)]
      .map { case (err, n, strategy) =>
        AntiPattern(
          id = s"ap-$pid-$ag-${Alma.idHash(err)}",
          agent = ag, projectId = pid,
          pattern = strategy, whyBad = err,
          betterAlternative = "avoid: " + strategy,
          occurrenceCount = n,
          lastSeen = asOf, createdAt = asOf,
          embedding = HashEmbedder.embed(err, dim),
          metadata = Map.empty)
      }.toDF()
    val fresh = candidates.join(
      store.antiPatterns(Some(projectId), Seq(agent)).select("id"), Seq("id"), "left_anti")
    if (!fresh.isEmpty) store.appendRows(fresh, MemoryType.AntiPatterns)
  }

  // ---- feedback loop (R10/R11 end-to-end) --------------------------------
  /** Record a usage signal against a retrieved memory; the next
    * retrieve blends the aggregated score in (reference
    * record_retrieval_feedback, types.py:352-379 + feedback.py:138-230).
    */
  def recordFeedback(memoryId: String, memoryType: String, agent: String,
      signal: String, asOf: Timestamp): Unit = {
    // An unknown signal would aggregate to a spurious neutral (0.0)
    // feedback score and shift rankings — reject it at the door.
    require(Seq(FeedbackSignal.Used, FeedbackSignal.Ignored,
      FeedbackSignal.ThumbsUp, FeedbackSignal.ThumbsDown).contains(signal),
      s"invalid feedback signal: $signal")
    store.saveFeedback(Seq(RetrievalFeedback(
      id = UUID.randomUUID().toString,
      memoryId = memoryId, memoryType = memoryType,
      agent = agent, projectId = projectId,
      signal = signal, timestamp = asOf)))
    events.emit(graft.events.MemoryEvent(
      graft.events.MemoryEventType.RagFeedback, agent, projectId,
      memoryType, memoryId, asOf.getTime * 1000L, Map("signal" -> signal)))
    cache.invalidateWhere(_ => true)
  }

  /** Store a user preference (core.py:382-411). */
  def addUserPreference(userId: String, category: String, preference: String,
      source: String, confidence: Double, asOf: Timestamp): UserPreference = {
    val p = UserPreference(
      id = UUID.randomUUID().toString,
      userId = userId, category = category, preference = preference,
      source = source, confidence = confidence, timestamp = now(asOf),
      metadata = Map.empty)
    store.savePreferences(Seq(p))
    events.emit(graft.events.MemoryEvent(
      graft.events.MemoryEventType.PreferenceAdded, userId, projectId,
      MemoryType.Preferences, p.id, asOf.getTime * 1000L,
      Map("category" -> category)))
    cache.invalidateWhere(_ => true)
    p
  }

  /** Store a domain fact (core.py:413-453). */
  def addDomainKnowledge(agent: String, domain: String, fact: String,
      source: String, confidence: Double, asOf: Timestamp): DomainKnowledge = {
    val k = DomainKnowledge(
      id = UUID.randomUUID().toString,
      agent = agent, projectId = projectId,
      domain = domain, fact = fact, source = source,
      confidence = confidence, lastVerified = now(asOf),
      embedding = HashEmbedder.embed(s"$domain $fact", embedDim),
      metadata = Map.empty)
    store.saveKnowledge(Seq(k))
    events.emit(graft.events.MemoryEvent(
      graft.events.MemoryEventType.KnowledgeAdded, agent, projectId,
      MemoryType.Knowledge, k.id, asOf.getTime * 1000L,
      Map("domain" -> domain)))
    invalidateCacheFor(agent)
    k
  }

  /** Prune stale outcomes and low-confidence heuristics (core.py:456-512
    * forget; learning-side semantics forgetting.py): both prunes are
    * distributed predicate deletes (count + complement snapshot
    * rewrite), never a driver-side partition of the table. Returns the
    * number of rows removed.
    */
  def forget(asOf: Timestamp, agent: Option[String] = None,
      olderThanDays: Int = 90, belowConfidence: Double = 0.3): Long = {
    val cutoff = new Timestamp(asOf.getTime - olderThanDays * 86400000L)
    val agentCond = agent.map(a => col("agent") === a).getOrElse(lit(true))
    val pruned =
      store.deleteWhere(MemoryType.Outcomes,
        col("projectId") === projectId && agentCond && col("timestamp") < lit(cutoff)) +
        store.deleteWhere(MemoryType.Heuristics,
          col("projectId") === projectId && agentCond && col("confidence") < belowConfidence)
    if (pruned > 0) agent match {
      case Some(a) => invalidateCacheFor(a)
      case None => cache.invalidateWhere(_ => true)
    }
    pruned
  }

  /** Per-type memory counts for this project, optionally narrowed to
    * one agent (core.py:514-537 get_stats; preferences are user-keyed,
    * so the agent filter applies to the agent-keyed collections only).
    */
  def getStats(agent: Option[String] = None): Map[String, Long] = agent match {
    case None => store.stats(Some(projectId))
    case Some(a) => Map(
      MemoryType.Heuristics -> store.heuristics(Some(projectId), Seq(a)).count(),
      MemoryType.Outcomes -> store.outcomes(Some(projectId), Seq(a)).count(),
      MemoryType.Preferences -> store.preferences().count(),
      MemoryType.Knowledge -> store.knowledge(Some(projectId), Seq(a)).count(),
      MemoryType.AntiPatterns -> store.antiPatterns(Some(projectId), Seq(a)).count())
  }

  /** Link an external artifact to a memory (core.py:744-807): stored as
    * a URL + integrity metadata row, never the payload itself.
    */
  def linkArtifact(memoryId: String, artifactType: String, storageUrl: String,
      asOf: Timestamp, filename: Option[String] = None,
      mimeType: Option[String] = None, sizeBytes: Option[Long] = None,
      checksum: Option[String] = None): ArtifactRef = {
    val a = ArtifactRef(
      id = UUID.randomUUID().toString,
      memoryId = memoryId, artifactType = artifactType,
      storageUrl = storageUrl, filename = filename, mimeType = mimeType,
      sizeBytes = sizeBytes, checksum = checksum,
      createdAt = now(asOf), metadata = Map.empty)
    store.saveArtifacts(Seq(a))
    a
  }

  /** Artifacts linked to a memory (core.py:809-819 get_artifacts). */
  def getArtifacts(memoryId: String): Seq[ArtifactRef] =
    store.artifacts(Some(memoryId)).collect().toSeq.sortBy(_.id)

  /** One maintenance cycle — the deterministic batch form of the
    * reference's background scheduler jobs (forgetting.py:1239-1470:
    * registered prune/decay/consolidate tasks on a daemon thread):
    * forget stale + low-confidence memories, enforce the outcome
    * quota, and compact fragmented memory directories. Returns a
    * per-task summary count.
    */
  def maintain(asOf: Timestamp, agent: Option[String] = None,
      olderThanDays: Int = 90, belowConfidence: Double = 0.3,
      maxOutcomesPerAgent: Int = 1000): Map[String, Long] = {
    val pruned = forget(asOf, agent, olderThanDays, belowConfidence)
    val archived = enforceQuota(maxOutcomesPerAgent, asOf)
    // Side tables included: the feedback log is the highest-append
    // table in the system (and feedbackSummary is scanned on every
    // retrieve), so it fragments fastest. An append racing the rewrite
    // (a concurrent recordUsage) is covered by the overwrite rescue —
    // files landing in the superseded snapshot after the rewrite's
    // read are moved into the committed one, not silently dropped.
    // Checkpoints stay EXCLUDED anyway: their natural compaction point
    // is cleanupCheckpoints, which already rewrites the table when a
    // run completes, so maintenance never touches live-run state at
    // all. vacuum below stays safe for every table — it only deletes
    // unreferenced snapshot dirs, never the current one appends land in.
    val compacted = MemoryType.AllStored
      .filterNot(_ == MemoryType.Checkpoints)
      .map(t => store.compact(t)).sum
    // Reclaim snapshots left by losing concurrent committers and
    // aborted writes — maintenance is the documented quiet point where
    // no reader is pinned to an old snapshot.
    MemoryType.AllStored.foreach(store.vacuum)
    Map("pruned" -> pruned, "quota_archived" -> archived, "files_before_compact" -> compacted)
  }

  /** Record what a whole workflow run learned (core.py:652-741). */
  def learnFromWorkflow(agent: String, workflowId: String, runId: String,
      result: String, summary: String, asOf: Timestamp,
      strategiesUsed: Seq[String] = Nil,
      successfulPatterns: Seq[String] = Nil,
      failedPatterns: Seq[String] = Nil,
      durationSeconds: Option[Double] = None,
      nodeCount: Option[Long] = None,
      errorMessage: Option[String] = None): WorkflowOutcome = {
    require(Seq("success", "failure", "partial", "cancelled", "timeout").contains(result),
      s"invalid workflow result: $result")
    val w = WorkflowOutcome(
      id = UUID.randomUUID().toString,
      agent = agent, projectId = projectId,
      workflowId = workflowId, runId = runId,
      result = result, summary = summary,
      strategiesUsed = strategiesUsed,
      successfulPatterns = successfulPatterns,
      failedPatterns = failedPatterns,
      durationSeconds = durationSeconds, nodeCount = nodeCount,
      errorMessage = errorMessage, createdAt = now(asOf), metadata = Map.empty)
    store.saveWorkflowOutcomes(Seq(w))
    invalidateCacheFor(agent)
    w
  }

  // ---- workflow checkpoint API (core.py:546-650, 821-850) ---------------
  /** Persist a crash-recovery checkpoint. Sequence numbers increment
    * per (run, branch); with `skipIfUnchanged` an identical state to
    * the branch tip writes nothing and returns None (the reference's
    * no-change skip). The tip lookup is a pushed-down point filter —
    * bounded by run length, never table size.
    */
  def checkpoint(
      runId: String,
      nodeId: String,
      stateJson: String,
      asOf: Timestamp,
      branchId: String = "main",
      parentCheckpointId: Option[String] = None,
      skipIfUnchanged: Boolean = true): Option[graft.workflow.Checkpoint] = {
    val tip = store.checkpoints(Some(runId))
      .filter(col("branchId") === branchId)
      .orderBy(col("sequenceNumber").desc, col("id"))
      .take(1).headOption
    if (skipIfUnchanged && tip.exists(_.stateJson == stateJson)) None
    else {
      val ck = graft.workflow.Checkpoint(
        id = UUID.randomUUID().toString,
        runId = runId, nodeId = nodeId, branchId = branchId,
        sequenceNumber = tip.map(_.sequenceNumber + 1).getOrElse(0L),
        parentCheckpointId = parentCheckpointId.orElse(tip.map(_.id)),
        stateJson = stateJson, createdAt = now(asOf))
      store.saveCheckpoints(Seq(ck))
      Some(ck)
    }
  }

  /** The checkpoint to resume from after a crash (core.py:600-616):
    * highest sequence in the run, optionally within one branch.
    */
  def getResumePoint(runId: String,
      branchId: Option[String] = None): Option[graft.workflow.Checkpoint] = {
    val base = store.checkpoints(Some(runId))
    branchId.fold(base.toDF())(b => base.filter(col("branchId") === b).toDF())
      .orderBy(col("sequenceNumber").desc, col("id"))
      .as[graft.workflow.Checkpoint]
      .take(1).headOption
  }

  /** Merge parallel branch states key-wise with named reducers
    * (core.py:618-650): later branches win for `last_value`; the A6
    * reducer registry handles the rest. States are bounded driver-side
    * dicts (workflow state, not data), so the merge runs over a tiny
    * local DataFrame through the same distributed reducer expressions
    * the state-reducer operator uses. State values are strings here
    * (the reference merges typed dicts), so numeric reducers return
    * the canonical double rendering ("8.0", not "8").
    */
  def mergeStates(
      states: Seq[Map[String, String]],
      reducerConfig: Map[String, String] = Map.empty,
      defaultReducer: String = "last_value"): Map[String, String] = {
    if (states.isEmpty) return Map.empty
    val rows = states.zipWithIndex.flatMap { case (m, i) =>
      m.toSeq.map { case (k, v) => (i.toString, k, v, i.toLong) }
    }
    val df = rows.toDF("branch", "key", "value", "seq")
    graft.workflow.Checkpoints.mergeBranchStates(df, reducerConfig, defaultReducer)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Drop all but the latest `keepLatest` checkpoints per branch of a
    * completed run (core.py:821-850). Returns the deleted count.
    */
  def cleanupCheckpoints(runId: String, keepLatest: Int = 1): Long =
    store.cleanupCheckpoints(runId, keepLatest)

  /** Bulk usage recording (core.py:1325-1368): every retrieved memory
    * gets a signal — `used` if its id is in `usedIds`, else `ignored` —
    * feeding the R10/R11 feedback re-rank. Returns the feedback ids.
    */
  def recordUsage(
      retrievedIds: Seq[String],
      usedIds: Set[String],
      memoryType: String,
      agent: String,
      asOf: Timestamp): Seq[String] = {
    val rows = retrievedIds.map { mid =>
      RetrievalFeedback(
        id = UUID.randomUUID().toString,
        memoryId = mid, memoryType = memoryType,
        agent = agent, projectId = projectId,
        signal = if (usedIds(mid)) FeedbackSignal.Used else FeedbackSignal.Ignored,
        timestamp = now(asOf))
    }
    store.saveFeedback(rows)
    // Usage signals feed feedbackSummary, which blends into EVERY
    // agent's scores — same full invalidation as recordFeedback.
    cache.invalidateWhere(_ => true)
    rows.map(_.id)
  }

  // ---- §3.1 the read path ----------------------------------------------
  /** filter → similarity → 4-factor score → (mode boosts) → threshold →
    * top-k (→ MMR when the mode asks for diversity) per memory type →
    * MemorySlice. One declarative plan per type; per-type score rules
    * follow scoring.py:77-269, boost/diversity semantics
    * engine.py:639-802.
    *
    * `topK <= 0` uses the mode's preset top-k.
    */
  def retrieve(
      query: String,
      agent: String,
      asOf: Timestamp,
      topK: Int = -1,
      mode: ModeConfig = Modes.Precise): MemorySlice =
    retrieveImpl(query, agent, asOf, topK, mode, graft.workflow.ScopeFilter())

  /** Workflow-scoped retrieval (core.py:851-924 retrieve_with_scope):
    * `retrieve` plus a conjunctive workflow-coordinate filter derived
    * from the context at the requested scope level. Rows tagged with a
    * DIFFERENT id are excluded; untagged rows still match (the
    * reference keeps legacy tables unfiltered — sqlite_local.py:1971's
    * back-compat no-op). The filter compiles into per-scan metadata
    * predicates, so at scale it prunes before scoring, not after.
    */
  def retrieveWithScope(
      task: String,
      agent: String,
      asOf: Timestamp,
      context: graft.workflow.WorkflowContext,
      scope: graft.workflow.RetrievalScope = graft.workflow.RetrievalScope.Agent,
      topK: Int = -1,
      mode: ModeConfig = Modes.Precise): MemorySlice = {
    context.validate()
    retrieveImpl(task, agent, asOf, topK, mode, context.scopeFilter(scope))
  }

  private def retrieveImpl(
      query: String,
      agent: String,
      asOf: Timestamp,
      topK: Int,
      mode: ModeConfig,
      wf: graft.workflow.ScopeFilter): MemorySlice = {
    val m = mode.normalized
    val k = if (topK > 0) topK else m.topK
    val wfFilter = wf.toMap
    // The FULL normalized mode config keys the entry (case-class
    // toString carries every field): two configs sharing a preset name
    // but differing in weights/threshold/boosts must not collide.
    val cacheKey = cache.nsKey(cacheNamespace(agent),
      query, k.toString, asOf.toString, m.toString,
      wfFilter.toSeq.sorted.map { case (a, b) => s"$a=$b" }.mkString(","))
    cache.get(cacheKey, asOf.getTime) match {
      case Some(hit) => return hit
      case None =>
    }
    val q = HashEmbedder.embed(QuerySanitizer.sanitize(query), embedDim)
    val agents = scope(agent).readableAgents
    val asOfUs = asOf.getTime * 1000L
    // R10/J4: the (small) per-memory feedback summary, broadcast-joined
    // into every type's scoring plan when signals exist. Feedback-less
    // rows keep their raw score (feedback.py:190-230).
    val fbSummary: Option[DataFrame] =
      if (store.exists(MemoryType.Feedback)) Some(store.feedbackSummary(Some(projectId)))
      else None

    def scoreAndTake(df: DataFrame, recencyCol: String,
        succ: org.apache.spark.sql.Column, conf: org.apache.spark.sql.Column,
        failureFlag: Option[org.apache.spark.sql.Column] = None): DataFrame = {
      val sim = VectorFunctions.cosineConst(col("embedding"), q)
      val days = (lit(asOfUs) - unix_micros(col(recencyCol))).cast("double") / lit(86400000000.0)
      val rec = pow(lit(0.5), days / lit(30.0))
      val base = lit(m.wSim) * sim + lit(m.wRecency) * rec +
        lit(m.wSuccess) * succ + lit(m.wConfidence) * conf
      // R8 diagnostic failure boost / R9 exact-match boost ladder.
      val failB = failureFlag match {
        case Some(f) if m.failureBoost != 1.0 =>
          when(f, lit(m.failureBoost)).otherwise(lit(1.0))
        case _ => lit(1.0)
      }
      val exactB =
        if (m.exactMatchBoost == 1.0) lit(1.0)
        else when(sim > 0.9, lit(m.exactMatchBoost))
          .when(sim > 0.8, lit(1.0 + (m.exactMatchBoost - 1.0) / 2.0))
          .otherwise(lit(1.0))
      val raw = df
        .withColumn("_sim", sim)
        .withColumn("_base_score", base)
      // Feedback blends into the BASE score (reference order:
      // engine.py:328 applies feedback to scorer output; the boost path
      // :561-571 multiplies afterwards). Blending after boosts would
      // let a boosted raw > 1 row LOSE score to perfect feedback, since
      // the feedback term is capped at 1.
      val blended = fbSummary match {
        case Some(fb) =>
          raw.join(broadcast(fb), col("id") === col("memoryId"), "left")
            .withColumn("_fb_score",
              when(col("feedback_score").isNotNull,
                lit(1.0 - Alma.FeedbackWeight) * col("_base_score") +
                  lit(Alma.FeedbackWeight) * (col("feedback_score") + lit(1.0)) / lit(2.0))
                .otherwise(col("_base_score")))
            .drop("memoryId", "feedback_score")
        case None => raw.withColumn("_fb_score", col("_base_score"))
      }
      val boosted = blended.withColumn("_score", col("_fb_score") * failB * exactB)
      boosted
        .drop("_base_score", "_fb_score")
        .filter(col("_score") >= m.minScore)
        .orderBy(col("_score").desc, col("id"))
        // Diversity modes over-fetch 3×k candidates for the driver-side
        // greedy MMR (R7, applied after the single collect below);
        // plain modes cap at k. Either way the per-type plan ends in a
        // TakeOrderedAndProject — bounded output at any corpus size.
        .limit(if (m.diversity <= 0.0) k else 3 * k)
    }

    // R13 provenance: memories read from an inherited agent are tagged
    // with their origin (engine.py:804-827 metadata.shared_from) — on
    // every memory type.
    def tagShared(meta: Map[String, String], owner: String): Map[String, String] =
      if (owner != agent) meta + ("shared_from" -> owner) else meta

    // The five per-type top-k plans union into ONE Spark job (SURVEY
    // §1.4 MemorySlice alternative): each branch wraps its typed row in
    // a discriminated envelope carrying (_score, _sim); a single
    // collect brings back ≤ 5×3k bounded rows, and the driver splits,
    // re-sorts per type, and applies MMR where the mode asks for it.
    def fused[T](src: DataFrame, capped: DataFrame, wrap: (T, Double, Double) => Alma.Fused)(
        implicit enc: org.apache.spark.sql.Encoder[(T, Double, Double)]): org.apache.spark.sql.Dataset[Alma.Fused] =
      capped.select(struct(src.columns.toIndexedSeq.map(col): _*).as("_1"),
          col("_score").as("_2"), col("_sim").as("_3"))
        .as[(T, Double, Double)]
        .map { case (t, s, si) => wrap(t, s, si) }

    // Workflow scope: each set coordinate must match when the row is
    // tagged with it; a missing metadata key passes (getItem → null →
    // coalesce true). Applied at the scan, before scoring.
    def scoped(df: DataFrame): DataFrame =
      wfFilter.foldLeft(df) { case (d, (key, value)) =>
        d.filter(coalesce(col("metadata").getItem(key) === lit(value), lit(true)))
      }
    val hdf = scoped(store.heuristics(Some(projectId), agents).toDF())
    val odf = scoped(store.outcomes(Some(projectId), agents).toDF())
    val kdf = scoped(store.knowledge(Some(projectId), agents).toDF())
    val adf = scoped(store.antiPatterns(Some(projectId), agents).toDF())
    val branches = Seq(
      fused[Heuristic](hdf, scoreAndTake(hdf, "lastValidated",
          succ = col("successCount").cast("double") /
            when(col("occurrenceCount") === 0, 1L).otherwise(col("occurrenceCount")),
          conf = col("confidence")),
        (h, s, si) => Alma.Fused(MemoryType.Heuristics, h = Some(h), score = s, sim = si)),
      fused[Outcome](odf, scoreAndTake(odf, "timestamp",
          succ = when(col("success"), 1.0).otherwise(0.3),
          conf = lit(1.0),
          failureFlag = Some(!col("success"))),
        (o, s, si) => Alma.Fused(MemoryType.Outcomes, o = Some(o), score = s, sim = si)),
      fused[DomainKnowledge](kdf, scoreAndTake(kdf, "lastVerified",
          succ = lit(1.0), conf = col("confidence")),
        (dk, s, si) => Alma.Fused(MemoryType.Knowledge, dk = Some(dk), score = s, sim = si))) ++
      (if (m.includeAntiPatterns)
        Seq(fused[AntiPattern](adf, scoreAndTake(adf, "lastSeen",
            succ = least(col("occurrenceCount").cast("double") / lit(10.0), lit(1.0)),
            conf = lit(1.0)),
          (ap, s, si) => Alma.Fused(MemoryType.AntiPatterns, ap = Some(ap), score = s, sim = si)))
      else Nil) :+
      // Preferences are unscored (engine.py:347-350).
      store.preferences().orderBy(col("id")).limit(k)
        .as[UserPreference].map(p => Alma.Fused(MemoryType.Preferences, up = Some(p)))
    val collected = branches.reduce(_ union _).collect().toSeq

    // Driver-side per-type finish over the bounded envelope rows:
    // deterministic (score desc, id) order, then greedy MMR (R7) when
    // the mode asks for diversity.
    def finish[T](mt: String, get: Alma.Fused => Option[T], idOf: T => String): Seq[T] = {
      val cand = collected.filter(_.memoryType == mt)
        .sortBy(e => (-e.score, idOf(get(e).get)))
      val picked =
        if (m.diversity <= 0.0) cand
        else {
          val cs = cand.zipWithIndex.map { case (e, i) =>
            PostProcess.Candidate(i.toLong, e.score, e.sim, "")
          }
          PostProcess.mmr(cs, lambda = m.diversity, k = k).map(c => cand(c.id.toInt))
        }
      picked.take(k).flatMap(e => get(e))
    }

    val hs = finish[Heuristic](MemoryType.Heuristics, _.h, _.id)
      .map(h => h.copy(metadata = tagShared(h.metadata, h.agent)))
    val os = finish[Outcome](MemoryType.Outcomes, _.o, _.id)
      .map(o => o.copy(metadata = tagShared(o.metadata, o.agent)))
    val ks = finish[DomainKnowledge](MemoryType.Knowledge, _.dk, _.id)
      .map(kr => kr.copy(metadata = tagShared(kr.metadata, kr.agent)))
    val aps = finish[AntiPattern](MemoryType.AntiPatterns, _.ap, _.id)
      .map(a => a.copy(metadata = tagShared(a.metadata, a.agent)))
    val prefs = collected.filter(_.memoryType == MemoryType.Preferences)
      .flatMap(_.up).sortBy(_.id).take(k)

    val slice = MemorySlice(
      heuristics = hs, outcomes = os, preferences = prefs,
      knowledge = ks, antiPatterns = aps,
      query = query, agent = agent)
    cache.put(cacheKey, slice, asOf.getTime)
    slice
  }

  /** Batch retrieval: many queries against every scored memory type in
    * ONE pass — the benchmark-runner shape (SURVEY §3.3: broadcast the
    * query vectors, scan each memory table once, Window top-k per
    * (query, type)). Returns (query_id, query, memory_type, rank, id,
    * score); N queries cost one job per type, not N.
    */
  def retrieveBatch(
      queries: Seq[String],
      agent: String,
      asOf: Timestamp,
      topK: Int = -1,
      mode: ModeConfig = Modes.Precise): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = mode.normalized
    val k = if (topK > 0) topK else m.topK
    val agents = scope(agent).readableAgents
    val asOfUs = asOf.getTime * 1000L
    val qdf = queries.zipWithIndex.map { case (q, i) =>
      (i.toLong, q, HashEmbedder.embed(QuerySanitizer.sanitize(q), embedDim))
    }.toDF("query_id", "query", "q_vec")

    def normalized(df: DataFrame, memoryType: String, recencyCol: String,
        succ: org.apache.spark.sql.Column, conf: org.apache.spark.sql.Column): DataFrame =
      df.select(col("id"), lit(memoryType).as("memory_type"),
        col("embedding"), col(recencyCol).as("_ts"),
        succ.as("_succ"), conf.as("_conf"))

    val candidates = Seq(
      normalized(store.heuristics(Some(projectId), agents).toDF(),
        MemoryType.Heuristics, "lastValidated",
        col("successCount").cast("double") /
          when(col("occurrenceCount") === 0, 1L).otherwise(col("occurrenceCount")),
        col("confidence")),
      normalized(store.outcomes(Some(projectId), agents).toDF(),
        MemoryType.Outcomes, "timestamp",
        when(col("success"), 1.0).otherwise(0.3), lit(1.0)),
      normalized(store.knowledge(Some(projectId), agents).toDF(),
        MemoryType.Knowledge, "lastVerified", lit(1.0), col("confidence")),
      normalized(store.antiPatterns(Some(projectId), agents).toDF(),
        MemoryType.AntiPatterns, "lastSeen",
        least(col("occurrenceCount").cast("double") / lit(10.0), lit(1.0)), lit(1.0))
    ).reduce(_ unionByName _)

    val sim = VectorFunctions.cosine(col("embedding"), col("q_vec"))
    val days = (lit(asOfUs) - unix_micros(col("_ts"))).cast("double") / lit(86400000000.0)
    val rec = pow(lit(0.5), days / lit(30.0))
    val score = lit(m.wSim) * sim + lit(m.wRecency) * rec +
      lit(m.wSuccess) * col("_succ") + lit(m.wConfidence) * col("_conf")
    val w = Window.partitionBy("query_id", "memory_type")
      .orderBy(col("_score").desc, col("id"))
    candidates.crossJoin(broadcast(qdf))
      .withColumn("_score", score)
      .filter(col("_score") >= m.minScore)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query"), col("memory_type"),
        col("rank"), col("id"), col("_score").as("score"))
      .orderBy("query_id", "memory_type", "rank")
  }

  /** Retrieve + render: the full read path ending in the token-capped
    * prompt projection (S11). `costOf` is the token estimator — the
    * chars/4 fallback by default; pass `tokenizer()` (or
    * `PostProcess.estimatorFor(merges)`) for BPE-trained counting.
    */
  def retrievePrompt(query: String, agent: String, asOf: Timestamp,
      topK: Int = -1, maxTokens: Int = 800,
      costOf: String => Int = graft.retrieval.PostProcess.estimateTokens): String =
    retrieve(query, agent, asOf, topK).toPrompt(maxTokens, costOf)

  /** Train a BPE token estimator on this project's stored memory text
    * (heuristic conditions/strategies, outcome descriptions, knowledge
    * facts) — the tokenizer-primary half of the reference's token
    * accounting, learned from the corpus the budgets actually gate.
    * One bounded vocabulary job; an empty store trains zero merges, so
    * `estimatorFor` degrades to the chars/4 fallback by itself.
    */
  def tokenizer(numMerges: Int = 64): String => Int = {
    val texts = Seq(
      store.heuristics(Some(projectId)).toDF()
        .select(concat_ws(" ", col("condition"), col("strategy")).as("t")),
      store.outcomes(Some(projectId)).toDF().select(col("taskDescription").as("t")),
      store.knowledge(Some(projectId)).toDF().select(col("fact").as("t")))
      .reduce(_.unionByName(_))
    graft.retrieval.PostProcess.estimatorFor(
      graft.functions.Bpe.trainMergesFrom(texts, "t", numMerges))
  }

  // ---- maintenance jobs -------------------------------------------------
  /** A10 quota enforcement: keep the top-N outcomes per agent by
    * recency, archive the overflow (forgetting.py:441-515).
    */
  def enforceQuota(maxOutcomesPerAgent: Int, asOf: Timestamp): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("agent").orderBy(col("timestamp").desc, col("id"))
    // The overflow id set stays a DataFrame end-to-end — the archive is
    // a broadcast semi/anti join, so quota enforcement never funnels
    // the table through the driver.
    val overflow = store.outcomes(Some(projectId)).toDF()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > maxOutcomesPerAgent)
      .select("id")
    val n = overflow.count()
    if (n > 0) {
      store.archiveIds(MemoryType.Outcomes, overflow, "quota", asOf.getTime * 1000L)
      cache.invalidateWhere(_ => true)
    }
    n
  }
}

object Alma {
  /** R10 blend weight (reference feedback.py default w=0.15). */
  val FeedbackWeight = 0.15

  /** One row of the fused retrieve plan: exactly one payload slot is
    * set, discriminated by memoryType, so the five per-type top-k
    * plans union into a single job and a single bounded collect.
    */
  private[graft] final case class Fused(
      memoryType: String,
      h: Option[Heuristic] = None,
      o: Option[Outcome] = None,
      dk: Option[DomainKnowledge] = None,
      ap: Option[AntiPattern] = None,
      up: Option[UserPreference] = None,
      score: Double = 0.0,
      sim: Double = 0.0)

  /** Deterministic collision-resistant id fragment (String.hashCode
    * collides trivially — e.g. "Aa"/"BB" — which would silently merge
    * distinct strategies or error classes). Lives on the companion so
    * executor-side row builders don't capture the facade.
    */
  def idHash(text: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  def apply(spark: SparkSession, root: String, projectId: String,
      scopes: Map[String, MemoryScope] = Map.empty): Alma =
    new Alma(new MemoryStore(spark, root), projectId, scopes)

  /** Build from a `.alma/config.yaml` (core.py:165-222 from_config):
    * storage dir, project id, and per-agent scope definitions. Every
    * storage backend the reference dispatches on (file/sqlite/postgres/
    * azure) maps to the one Parquet-backed MemoryStore here — the
    * config's `storage_dir` is the store root. Missing file → defaults
    * (loader.py:40-43).
    */
  def fromConfig(spark: SparkSession, configPath: String): Alma = {
    import graft.config.ConfigLoader
    val cfg = ConfigLoader.load(configPath)
    val scopes = ConfigLoader.section(cfg, "agents").map { case (name, sc) =>
      name -> MemoryScope(
        agent = name,
        canLearn = ConfigLoader.strings(sc, "can_learn").toSet,
        cannotLearn = ConfigLoader.strings(sc, "cannot_learn").toSet,
        shareWith = ConfigLoader.strings(sc, "share_with").toSet,
        inheritFrom = ConfigLoader.strings(sc, "inherit_from").toSet,
        minOccurrencesForHeuristic =
          ConfigLoader.int(sc, "min_occurrences_for_heuristic", 3))
    }
    apply(spark,
      ConfigLoader.str(cfg, "storage_dir", ".alma"),
      ConfigLoader.str(cfg, "project_id", "default"),
      scopes)
  }
}
