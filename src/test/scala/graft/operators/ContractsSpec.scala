package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.retrieval.{Modes, QuerySanitizer, Verification}
import graft.storage.MemoryScope
import org.apache.spark.sql.functions._

/** The Contracts pack's reason to exist: each oracle-checked query is
  * pinned row-for-row to the ACTUAL library function it re-expresses,
  * so the DuckDB gate transitively verifies the library semantics
  * (query ⇔ column expressions ⇔ library code).
  */
class ContractsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q_sanitize_query matches QuerySanitizer.sanitize on every planted shape") {
    val planted = Contracts.sanitizePlanted(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("q_sanitize_query").collect()
    assert(rows.length == planted.size)
    // All five cascade shapes are present in the corpus.
    assert(planted.keySet.map(_ % 5).size == 5)
    rows.foreach { r =>
      val (id, got) = (r.getLong(0), r.getString(1))
      assert(got == QuerySanitizer.sanitize(planted(id)), s"doc $id")
    }
  }

  test("q_mode_infer matches Modes.infer and the preset configs") {
    val planted = Contracts.modePlanted(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("q_mode_infer").collect()
    assert(rows.length == planted.size)
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val m = Modes.infer(planted(id)).normalized
      assert(r.getString(r.fieldIndex("mode")) == m.name, s"doc $id mode")
      assert(r.getLong(r.fieldIndex("top_k")) == m.topK.toLong, s"doc $id top_k")
      assert(r.getDouble(r.fieldIndex("min_score")) == m.minScore, s"doc $id min_score")
      assert(r.getDouble(r.fieldIndex("w_sim")) == m.wSim, s"doc $id w_sim")
      assert(r.getDouble(r.fieldIndex("w_recency")) == m.wRecency, s"doc $id w_recency")
      assert(r.getDouble(r.fieldIndex("w_success")) == m.wSuccess, s"doc $id w_success")
      assert(r.getDouble(r.fieldIndex("w_confidence")) == m.wConfidence, s"doc $id w_conf")
    }
    // Precedence shape: similar+wrong plants must resolve diagnostic,
    // not similarity (Diagnostic precedes Similarity in keywordTable).
    val byShape = rows.filter(r => r.getLong(0) % 7 == 6)
    assert(byShape.nonEmpty && byShape.forall(_.getString(1) == "diagnostic"))
  }

  test("q_scope_acl matches MemoryScope.isAllowed per derived scope") {
    val rows = q("q_scope_acl").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getLong(r.fieldIndex("user_id"))
      val scope = MemoryScope(
        agent = s"agent_$u",
        canLearn = if (u % 3 == 0) Set.empty else Set("purchase", "view"),
        cannotLearn = if (u % 2 == 0) Set("error") else Set.empty)
      assert(r.getBoolean(r.fieldIndex("allowed")) ==
        scope.isAllowed(r.getString(r.fieldIndex("event_type"))),
        s"event ${r.getLong(0)}")
    }
    // Both outcomes occur (the ACL actually discriminates).
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("q_cross_verify matches Verification.crossVerify per group") {
    val got = q("q_cross_verify").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // Rebuild each group's candidate texts exactly as the query derives
    // them and run the real driver-side consensus.
    val cands = graft.io.Tables.events(spark, Sf)
      .select((col("user_id") % 25).as("group_id"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("group_id")
          .orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 8)
      .select(col("group_id"), col("event_id"),
        concat_ws(" ", col("event_type"),
          concat(lit("v"), floor(col("value") / 100).cast("long").cast("string")),
          when(col("event_id") % 2 === 0,
            concat(lit("u"), (col("event_id") % 5).cast("string")))).as("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.size == cands.length)
    cands.groupBy(_._1).foreach { case (gid, members) =>
      val verdicts = Verification.crossVerify(
        members.toSeq.map(m => m._2 -> m._3),
        overlapThreshold = 0.6, verifyQuorum = 0.5)
      verdicts.foreach { v =>
        val (votes, category) = got((gid, v.id))
        assert(votes == v.supportVotes.toLong, s"group $gid id ${v.id} votes")
        assert(category == v.category, s"group $gid id ${v.id} category")
      }
    }
  }

  test("q_prompt_projection prompts respect the budget and number sequentially") {
    val rows = q("q_prompt_projection").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val prompt = r.getString(r.fieldIndex("prompt"))
      val n = r.getLong(r.fieldIndex("n_included"))
      assert(prompt.startsWith("# Relevant memories\n"))
      assert(prompt.length / 4 <= 48, s"slot ${r.getLong(0)} over budget")
      val nums = prompt.linesIterator.drop(1)
        .map(_.takeWhile(_ != '.')).map(_.toInt).toSeq
      assert(nums == (1 to n.toInt), s"slot ${r.getLong(0)} numbering")
      assert(n > 0, s"slot ${r.getLong(0)} empty")
    }
  }

  test("q_scoped_retrieval matches the WorkflowContext scope-filter semantics") {
    val ctx = graft.workflow.WorkflowContext(
      tenantId = Some("t1"), workflowId = Some("view"), runId = Some("r2"))
    val wf = ctx.scopeFilter(graft.workflow.RetrievalScope.Run).toMap
    val coords = graft.io.Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("event_type")).collect()
      .map { r =>
        val (e, u) = (r.getLong(0), r.getLong(1))
        val tags: Map[String, String] =
          if (e % 7 == 0) Map.empty
          else Map("tenant_id" -> s"t${u % 3}", "workflow_id" -> r.getString(2),
            "run_id" -> s"r${e % 5}")
        e -> tags
      }.toMap
    val rows = q("q_scoped_retrieval").collect()
    assert(rows.length == coords.size)
    rows.foreach { r =>
      val tags = coords(r.getLong(0))
      // Library semantics: every set coordinate must match when the row
      // carries the key; missing keys pass (back-compat untagged rows).
      val expect = wf.forall { case (k, v) => tags.get(k).forall(_ == v) }
      assert(r.getLong(1) == tags.size.toLong, s"event ${r.getLong(0)} tags")
      assert(r.getBoolean(2) == expect, s"event ${r.getLong(0)}")
    }
    // The filter actually discriminates at this SF.
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
  }

  test("q_checkpoint_cleanup keeps exactly latest-2 per branch of run1 only") {
    val rows = q("q_checkpoint_cleanup").collect()
    val byRun = rows.groupBy(_.getString(0))
    // run1 branches were cut to ≤2 survivors; run0 untouched (bigger).
    assert(byRun("run1").forall(_.getLong(2) <= 2L))
    assert(byRun("run0").forall(_.getLong(2) > 2L))
    // Survivors are the TOP sequences: max_seq must be the branch max
    // over all of run1's checkpoints, which cleanup never deletes.
    val branchMax = graft.io.Tables.events(spark, Sf)
      .filter(col("user_id") % 2 === 1)
      .groupBy((col("event_id") % 3).as("b"))
      .agg(max("event_id")).collect()
      .map(r => s"b${r.getLong(0)}" -> r.getLong(1)).toMap
    byRun("run1").foreach { r =>
      assert(r.getLong(3) == branchMax(r.getString(1)), s"branch ${r.getString(1)}")
    }
  }

  test("q_write_guard keeps no blocked strategy and some strategies are blocked") {
    val kept = q("q_write_guard").collect().map(_.getString(1)).toSet
    val all = graft.io.Tables.events(spark, Sf)
      .filter(col("event_type") === "signup")
      .select(concat(lit("strat_"), (col("user_id") % 40).cast("string")).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(kept.subsetOf(all))
    assert(kept != all, "guard blocked nothing — threshold too high for this SF")
  }
}
