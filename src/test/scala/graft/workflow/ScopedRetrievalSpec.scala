package graft.workflow

import java.nio.file.Files
import java.sql.Timestamp

import graft.{Alma, SparkSpec}

/** Workflow-scoped retrieval + config bootstrap (reference context.py,
  * core.py:165-222 from_config, :851-924 retrieve_with_scope).
  */
class ScopedRetrievalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshAlma(): Alma =
    Alma(spark, Files.createTempDirectory("alma-scoped").toString, projectId = "proj1")

  // ---- pure context model ------------------------------------------------

  test("context validation enforces the id hierarchy") {
    WorkflowContext(workflowId = Some("wf"), runId = Some("r1")).validate()
    intercept[IllegalArgumentException] {
      WorkflowContext(runId = Some("r1")).validate() // run without workflow
    }
    intercept[IllegalArgumentException] {
      WorkflowContext(workflowId = Some("wf"), nodeId = Some("n1")).validate()
    }
    intercept[IllegalArgumentException] {
      WorkflowContext(tenantId = None).validate(requireTenant = true)
    }
  }

  test("scope filter widens with the scope level and GLOBAL is unfiltered") {
    val ctx = WorkflowContext(tenantId = Some("t1"), workflowId = Some("wf"),
      runId = Some("r1"), nodeId = Some("n1"))
    assert(ctx.scopeFilter(RetrievalScope.Global).isEmpty)
    assert(ctx.scopeFilter(RetrievalScope.Tenant).toMap == Map("tenant_id" -> "t1"))
    assert(ctx.scopeFilter(RetrievalScope.Run).toMap ==
      Map("tenant_id" -> "t1", "workflow_id" -> "wf", "run_id" -> "r1"))
    assert(ctx.scopeFilter(RetrievalScope.Node).toMap.keySet ==
      Set("tenant_id", "workflow_id", "run_id", "node_id"))
    assert(RetrievalScope.Global.isBroaderThan(RetrievalScope.Node))
    assert(!RetrievalScope.Run.isBroaderThan(RetrievalScope.Workflow))
    assert(RetrievalScope.fromString("TENANT") == RetrievalScope.Tenant)
    intercept[IllegalArgumentException](RetrievalScope.fromString("bogus"))
  }

  // ---- scoped retrieval through the engine -------------------------------

  test("retrieveWithScope excludes other-run outcomes but keeps untagged rows") {
    val alma = freshAlma()
    val run1 = WorkflowContext(workflowId = Some("wf"), runId = Some("run1"))
    val run2 = WorkflowContext(workflowId = Some("wf"), runId = Some("run2"))
    alma.learn("helena", "deploy", "deploy the payment service", success = true,
      strategyUsed = "canary rollout", asOf = ts("2024-01-01 10:00:00"), context = Some(run1))
    alma.learn("helena", "deploy", "deploy the payment service", success = true,
      strategyUsed = "blue green switch", asOf = ts("2024-01-01 11:00:00"), context = Some(run2))
    alma.learn("helena", "deploy", "deploy the payment service", success = true,
      strategyUsed = "rolling update", asOf = ts("2024-01-01 12:00:00")) // untagged

    val scoped = alma.retrieveWithScope("deploy the payment service", "helena",
      ts("2024-02-01 00:00:00"), run1, scope = RetrievalScope.Run, topK = 10)
    val strategies = scoped.outcomes.map(_.strategyUsed).toSet
    assert(strategies.contains("canary rollout"))
    assert(strategies.contains("rolling update")) // untagged passes (back-compat)
    assert(!strategies.contains("blue green switch")) // other run excluded

    val global = alma.retrieveWithScope("deploy the payment service", "helena",
      ts("2024-02-01 00:00:00"), run1, scope = RetrievalScope.Global, topK = 10)
    assert(global.outcomes.map(_.strategyUsed).toSet.contains("blue green switch"))
  }

  test("scoped and unscoped retrievals do not share cache entries") {
    val alma = freshAlma()
    val run1 = WorkflowContext(workflowId = Some("wf"), runId = Some("run1"))
    alma.learn("helena", "deploy", "ship it", success = true,
      strategyUsed = "tagged strategy", asOf = ts("2024-01-01 10:00:00"), context = Some(run1))
    alma.learn("helena", "deploy", "ship it", success = true,
      strategyUsed = "other run strategy", asOf = ts("2024-01-01 11:00:00"),
      context = Some(run1.copy(runId = Some("run2"))))
    val unscoped = alma.retrieve("ship it", "helena", ts("2024-02-01 00:00:00"), topK = 10)
    val scoped = alma.retrieveWithScope("ship it", "helena",
      ts("2024-02-01 00:00:00"), run1, scope = RetrievalScope.Run, topK = 10)
    assert(unscoped.outcomes.size == 2)
    assert(scoped.outcomes.map(_.strategyUsed) == Seq("tagged strategy"))
  }

  // ---- config bootstrap --------------------------------------------------

  test("fromConfig builds scopes and storage from a yaml file") {
    val dir = Files.createTempDirectory("alma-cfg")
    val yaml =
      s"""alma:
         |  storage: file
         |  storage_dir: $dir/store
         |  project_id: proj-yaml
         |  agents:
         |    helena:
         |      can_learn: [deploy, ingest]
         |      cannot_learn: [secrets]
         |      inherit_from: [senior]
         |      min_occurrences_for_heuristic: 2
         |    senior:
         |      can_learn: []
         |""".stripMargin
    val p = dir.resolve("config.yaml")
    Files.writeString(p, yaml)
    val alma = Alma.fromConfig(spark, p.toString)
    assert(alma.projectId == "proj-yaml")
    assert(alma.store.root == s"$dir/store")
    // min_occurrences_for_heuristic=2 → two successes already promote.
    (1 to 2).foreach { i =>
      alma.learn("helena", "deploy", "deploy the api", success = true,
        strategyUsed = "canary", asOf = ts(s"2024-01-0$i 10:00:00"))
    }
    assert(alma.store.heuristics(Some("proj-yaml")).count() == 1L)
  }

  test("fromConfig falls back to defaults when the file is missing, and expands env vars") {
    val alma = Alma.fromConfig(spark, "/nonexistent/config.yaml")
    assert(alma.projectId == "default")
    import graft.config.ConfigLoader
    val dir = Files.createTempDirectory("alma-cfg2")
    val p = dir.resolve("config.yaml")
    Files.writeString(p, "project_id: ${HOME}-proj\n")
    val cfg = ConfigLoader.load(p.toString)
    assert(ConfigLoader.str(cfg, "project_id", "") == s"${sys.env("HOME")}-proj")
    intercept[IllegalArgumentException] {
      Files.writeString(p, "project_id: ${GRAFT_UNSET_VAR_XYZ}\n")
      ConfigLoader.load(p.toString)
    }
  }
}
