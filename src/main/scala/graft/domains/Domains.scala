package graft.domains

/** Domain memory schema registry (reference: alma/domains/types.py:14-205,
  * alma/domains/schemas.py:1-448, alma/domains/factory.py): typed
  * per-domain entity/relationship vocabularies with consistency
  * validation and learning-category gating. The reference validates
  * entities one dict at a time; here the registry is driver-side
  * metadata (a few dozen rows per schema) and entity validation is a
  * DISTRIBUTED query — [[graft.operators.DomainValidate]] broadcasts
  * the schema's requirement table and validates a corpus of entities
  * in one pass.
  */
final case class EntityType(
    name: String,
    description: String,
    attributes: Seq[String],
    requiredAttributes: Seq[String] = Nil)

final case class RelationshipType(
    name: String,
    description: String,
    sourceType: String,
    targetType: String)

final case class DomainSchema(
    name: String,
    description: String,
    learningCategories: Seq[String],
    excludedCategories: Seq[String],
    entityTypes: Seq[EntityType],
    relationshipTypes: Seq[RelationshipType]) {

  def entityType(n: String): Option[EntityType] = entityTypes.find(_.name == n)

  /** Category gate (types.py:174-181): a non-empty allow-list is
    * exhaustive; the deny-list beats everything.
    */
  def isCategoryAllowed(category: String): Boolean =
    (learningCategories.isEmpty || learningCategories.contains(category)) &&
      !excludedCategories.contains(category)

  /** Schema consistency (types.py:182-205): relationship endpoints must
    * name declared entity types; entity type names must be unique.
    */
  def validate(): Seq[String] = {
    val names = entityTypes.map(_.name).toSet
    val badRel = relationshipTypes.flatMap { r =>
      val s = if (!names.contains(r.sourceType))
        Seq(s"Relationship '${r.name}' references unknown source type: ${r.sourceType}")
      else Nil
      val t = if (!names.contains(r.targetType))
        Seq(s"Relationship '${r.name}' references unknown target type: ${r.targetType}")
      else Nil
      s ++ t
    }
    val dups = entityTypes.groupBy(_.name).collect {
      case (n, es) if es.size > 1 => s"Duplicate entity type name: $n"
    }.toSeq
    badRel ++ dups
  }
}

/** The six pre-built domains (schemas.py:10-448), entity and
  * relationship vocabularies mirrored name-for-name. Required
  * attributes default empty exactly as the reference prebuilts leave
  * them; validation queries opt in per entity type (the reference's
  * `required_attributes` field, types.py:29).
  */
object DomainSchemas {

  private def e(name: String, attrs: String*) = EntityType(name, name, attrs)
  private def r(name: String, s: String, t: String) = RelationshipType(name, name, s, t)

  val coding: DomainSchema = DomainSchema(
    name = "coding",
    description = "Memory schema for software development workflows",
    learningCategories = Seq("testing_strategies", "selector_patterns",
      "api_design_patterns", "error_handling", "performance_optimization",
      "debugging_techniques", "code_review_patterns", "refactoring_strategies"),
    excludedCategories = Nil,
    entityTypes = Seq(
      e("feature", "status", "tests", "files", "priority", "owner"),
      e("bug", "severity", "reproduction_steps", "fix", "status", "root_cause"),
      e("test", "type", "status", "coverage", "flaky", "last_run"),
      e("component", "path", "type", "dependencies", "tests"),
      e("api_endpoint", "method", "path", "request_schema", "response_schema", "auth")),
    relationshipTypes = Seq(
      r("tests", "test", "feature"), r("fixes", "feature", "bug"),
      r("depends_on", "component", "component"), r("implements", "feature", "component")))

  val research: DomainSchema = DomainSchema(
    name = "research",
    description = "Memory schema for research workflows",
    learningCategories = Seq("literature_review_patterns", "methodology_selection",
      "data_analysis_strategies", "citation_patterns", "hypothesis_formulation",
      "experiment_design", "peer_review_patterns", "synthesis_techniques"),
    excludedCategories = Nil,
    entityTypes = Seq(
      e("paper", "title", "authors", "year", "venue", "findings"),
      e("hypothesis", "statement", "status", "evidence", "confidence"),
      e("experiment", "design", "status", "results", "conclusions"),
      e("dataset", "name", "source", "size", "format"),
      e("finding", "statement", "support", "significance")),
    relationshipTypes = Seq(
      r("cites", "paper", "paper"), r("tests", "experiment", "hypothesis"),
      r("uses", "experiment", "dataset"), r("supports", "finding", "hypothesis")))

  val sales: DomainSchema = DomainSchema(
    name = "sales",
    description = "Memory schema for sales workflows",
    learningCategories = Seq("objection_handling", "closing_techniques",
      "qualification_patterns", "follow_up_timing", "value_proposition",
      "discovery_questions", "relationship_building", "negotiation_strategies"),
    excludedCategories = Nil,
    entityTypes = Seq(
      e("lead", "name", "company", "stage", "value", "source"),
      e("objection", "type", "response", "effectiveness"),
      e("conversation", "date", "channel", "outcome", "next_steps"),
      e("deal", "value", "stage", "close_date", "probability"),
      e("product", "name", "price", "features", "fit")),
    relationshipTypes = Seq(
      r("converts_to", "lead", "deal"), r("raised", "lead", "objection"),
      r("had", "lead", "conversation"), r("interested_in", "lead", "product")))

  val general: DomainSchema = DomainSchema(
    name = "general",
    description = "General-purpose memory schema",
    learningCategories = Seq("task_patterns", "error_recovery", "tool_usage",
      "efficiency_patterns", "user_preferences", "context_switching"),
    excludedCategories = Nil,
    entityTypes = Seq(
      e("task", "status", "priority", "deadline", "owner"),
      e("resource", "type", "location", "access"),
      e("goal", "description", "status", "progress"),
      e("context", "description", "scope", "active")),
    relationshipTypes = Seq(
      r("achieves", "task", "goal"), r("uses", "task", "resource"),
      r("requires", "goal", "context")))

  val customerSupport: DomainSchema = DomainSchema(
    name = "customer_support",
    description = "Memory schema for customer support workflows",
    learningCategories = Seq("issue_classification", "resolution_patterns",
      "escalation_criteria", "customer_sentiment", "knowledge_retrieval",
      "follow_up_patterns", "edge_case_handling"),
    excludedCategories = Nil,
    entityTypes = Seq(
      e("ticket", "status", "priority", "category", "resolution"),
      e("article", "title", "topic", "helpfulness"),
      e("customer", "tier", "history", "sentiment"),
      e("issue", "type", "severity", "frequency", "workaround")),
    relationshipTypes = Seq(
      r("resolves", "article", "issue"), r("submitted_by", "ticket", "customer"),
      r("related_to", "ticket", "issue")))

  val contentCreation: DomainSchema = DomainSchema(
    name = "content_creation",
    description = "Memory schema for content creation workflows",
    learningCategories = Seq("writing_patterns", "engagement_optimization",
      "audience_targeting", "seo_strategies", "content_formatting",
      "voice_and_tone", "visual_content_patterns"),
    excludedCategories = Nil,
    entityTypes = Seq(
      e("content", "type", "title", "status", "platform", "performance_metrics"),
      e("audience", "name", "demographics", "interests", "pain_points"),
      e("campaign", "name", "goal", "start_date", "end_date", "budget"),
      e("template", "type", "structure", "usage_count", "effectiveness")),
    relationshipTypes = Seq(
      r("targets", "content", "audience"), r("part_of", "content", "campaign"),
      r("uses", "content", "template")))

  val all: Seq[DomainSchema] =
    Seq(coding, research, sales, general, customerSupport, contentCreation)

  def get(name: String): Option[DomainSchema] = all.find(_.name == name)
}
