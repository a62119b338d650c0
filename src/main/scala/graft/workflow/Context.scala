package graft.workflow

/** Workflow-scoped retrieval model (reference alma/workflow/context.py:
  * 18-69 RetrievalScope, 73-195 WorkflowContext; alma/types.py:89-125
  * ScopeFilter): WHERE to search, as opposed to MemoryScope's what an
  * agent may learn. Pure driver-side value classes — the Spark side is
  * `Alma.retrieveWithScope`, which compiles the filter into pushed-down
  * metadata predicates on each memory scan.
  */
sealed abstract class RetrievalScope(val name: String, private val rank: Int) {
  /** NODE < RUN < WORKFLOW < AGENT < TENANT < GLOBAL (context.py:59-69). */
  def isBroaderThan(other: RetrievalScope): Boolean = rank > other.rank
}

object RetrievalScope {
  case object Node extends RetrievalScope("node", 0)
  case object Run extends RetrievalScope("run", 1)
  case object Workflow extends RetrievalScope("workflow", 2)
  case object Agent extends RetrievalScope("agent", 3)
  case object Tenant extends RetrievalScope("tenant", 4)
  case object Global extends RetrievalScope("global", 5)

  val All: Seq[RetrievalScope] = Seq(Node, Run, Workflow, Agent, Tenant, Global)

  def fromString(value: String): RetrievalScope =
    All.find(_.name == value.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"Invalid RetrievalScope: '$value'. Valid options: ${All.map(_.name)}"))
}

/** Conjunctive workflow id filter (types.py:89-125). Only the set
  * fields constrain; `toMap` renders the metadata keys the engine
  * stamps/filters on.
  */
final case class ScopeFilter(
    tenantId: Option[String] = None,
    workflowId: Option[String] = None,
    runId: Option[String] = None,
    nodeId: Option[String] = None,
    branchId: Option[String] = None) {

  def toMap: Map[String, String] =
    (Seq("tenant_id" -> tenantId, "workflow_id" -> workflowId,
      "run_id" -> runId, "node_id" -> nodeId, "branch_id" -> branchId)
      .collect { case (k, Some(v)) => k -> v }).toMap

  def isEmpty: Boolean = toMap.isEmpty
}

/** Hierarchical workflow coordinates for scoped memory operations
  * (context.py:73-195). `validate` enforces the id hierarchy;
  * `scopeFilter` widens/narrows the filter per requested scope.
  */
final case class WorkflowContext(
    tenantId: Option[String] = None,
    workflowId: Option[String] = None,
    runId: Option[String] = None,
    nodeId: Option[String] = None,
    branchId: Option[String] = None,
    metadata: Map[String, String] = Map.empty) {

  /** context.py:99-126: node/branch need run, run needs workflow. */
  def validate(requireTenant: Boolean = false): Unit = {
    if (requireTenant && tenantId.isEmpty)
      throw new IllegalArgumentException(
        "tenant_id is required for multi-tenant deployments")
    if (nodeId.isDefined && runId.isEmpty)
      throw new IllegalArgumentException("node_id requires run_id to be set")
    if (runId.isDefined && workflowId.isEmpty)
      throw new IllegalArgumentException("run_id requires workflow_id to be set")
    if (branchId.isDefined && runId.isEmpty)
      throw new IllegalArgumentException("branch_id requires run_id to be set")
  }

  /** context.py:128-167: each level keeps the ids down to its depth;
    * AGENT scopes by tenant only (agent filtering is the caller's
    * readable-agents set, not the workflow filter).
    */
  def scopeFilter(scope: RetrievalScope): ScopeFilter = scope match {
    case RetrievalScope.Global => ScopeFilter()
    case RetrievalScope.Tenant | RetrievalScope.Agent => ScopeFilter(tenantId = tenantId)
    case RetrievalScope.Workflow => ScopeFilter(tenantId = tenantId, workflowId = workflowId)
    case RetrievalScope.Run =>
      ScopeFilter(tenantId = tenantId, workflowId = workflowId, runId = runId)
    case RetrievalScope.Node =>
      ScopeFilter(tenantId = tenantId, workflowId = workflowId,
        runId = runId, nodeId = nodeId)
  }

  def withNode(node: String): WorkflowContext = copy(nodeId = Some(node))
  def withBranch(branch: String): WorkflowContext = copy(branchId = Some(branch))

  /** The metadata stamp a memory written under this context carries. */
  def toStamp: Map[String, String] =
    ScopeFilter(tenantId, workflowId, runId, nodeId, branchId).toMap
}
