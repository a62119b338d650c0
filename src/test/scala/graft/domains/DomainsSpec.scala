package graft.domains

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Pins the domain schema registry to the reference's semantics
  * (alma/domains/types.py validate/is_category_allowed, the six
  * prebuilt schemas of schemas.py) and the distributed validation
  * query to the registry's own rules.
  */
class DomainsSpec extends SparkSpec {

  test("the six prebuilt schemas mirror the reference and validate clean") {
    assert(DomainSchemas.all.map(_.name) == Seq("coding", "research", "sales",
      "general", "customer_support", "content_creation"))
    DomainSchemas.all.foreach(s => assert(s.validate().isEmpty, s.name))
    // Spot-pin entity vocabularies (schemas.py:33-57, 110-148).
    assert(DomainSchemas.coding.entityTypes.map(_.name) ==
      Seq("feature", "bug", "test", "component", "api_endpoint"))
    assert(DomainSchemas.research.entityTypes.map(_.name) ==
      Seq("paper", "hypothesis", "experiment", "dataset", "finding"))
    assert(DomainSchemas.coding.learningCategories.size == 8)
    assert(DomainSchemas.get("sales").isDefined && DomainSchemas.get("nope").isEmpty)
  }

  test("validate() catches unknown relationship endpoints and duplicate entity names") {
    val bad = DomainSchemas.coding.copy(
      entityTypes = DomainSchemas.coding.entityTypes :+
        EntityType("bug", "dup", Seq("x")),
      relationshipTypes = DomainSchemas.coding.relationshipTypes :+
        RelationshipType("haunts", "ghost", "ghost", "feature"))
    val errs = bad.validate()
    assert(errs.exists(_.contains("unknown source type: ghost")))
    assert(errs.exists(_.contains("Duplicate entity type name: bug")))
  }

  test("is_category_allowed: non-empty allow-list is exhaustive, deny-list beats allow") {
    val s = DomainSchemas.coding
    assert(s.isCategoryAllowed("error_handling"))
    assert(!s.isCategoryAllowed("marketing_tricks"))
    // Empty allow-list means everything (types.py:176-177)...
    val open = s.copy(learningCategories = Nil)
    assert(open.isCategoryAllowed("anything_at_all"))
    // ...except the deny-list, which wins even over an explicit allow.
    val denied = s.copy(excludedCategories = Seq("error_handling"))
    assert(!denied.isCategoryAllowed("error_handling"))
  }

  test("q_domain_validate agrees with the registry rules row by row") {
    val out = SparkEntry.queries("q_domain_validate")(spark, Sf).collect()
    assert(out.nonEmpty)
    val coding = DomainSchemas.coding
    out.foreach { r =>
      val et = r.getAs[String]("entity_type")
      assert(coding.entityType(et).isDefined, et)
      val required = coding.entityType(et).get.attributes.take(3)
      val id = r.getAs[Long]("entity_id")
      // Same presence rule the synthesis declares: attr i missing iff
      // (id + i) % (i + 2) == 0.
      val expectMissing = required.zipWithIndex
        .collect { case (a, i) if (id + i) % (i + 2) == 0 => a }
      assert(r.getAs[String]("missing_csv") == expectMissing.mkString(","), s"entity $id")
      assert(r.getAs[Long]("n_missing") == expectMissing.size.toLong)
      val catOk = coding.isCategoryAllowed(r.getAs[String]("category"))
      assert(r.getAs[Int]("cat_allowed") == (if (catOk) 1 else 0))
      assert(r.getAs[Int]("valid") ==
        (if (catOk && expectMissing.isEmpty) 1 else 0))
    }
    // Both failure modes must occur in the corpus or the gate is untested.
    assert(out.exists(_.getAs[Int]("cat_allowed") == 0))
    assert(out.exists(r => r.getAs[Long]("n_missing") > 0))
    assert(out.exists(_.getAs[Int]("valid") == 1))
  }
}
