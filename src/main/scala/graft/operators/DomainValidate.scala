package graft.operators

import graft.Q
import graft.domains.DomainSchemas
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed entity validation against the domain schema registry
  * (reference: alma/domains/types.py:34-40 validate_entity +
  * :174-181 is_category_allowed, exercised through the coding schema
  * of schemas.py:10-86): the reference validates one entity dict at a
  * time in Python; here the schema's requirement table (a handful of
  * rows of driver metadata) broadcasts and a whole entity corpus
  * validates in one narrow pass — missing required attributes via an
  * indexed array filter, learning-category gating via the schema's
  * allow/deny lists.
  *
  * Both sides of the oracle derive from the SAME [[DomainSchemas]]
  * object: the DuckDB SQL is GENERATED from the registry (requirement
  * VALUES rows, category list), so schema edits cannot silently
  * diverge the contract. Entities synthesize deterministically from
  * `events` (entity type from event_type, category by user, attribute
  * presence by (entity_id + i) mod (i + 2) per required index i).
  */
object DomainValidate {

  private val schema = DomainSchemas.coding

  /** event_type → coding entity type. */
  private val TypeMap = Seq(
    "error" -> "bug", "purchase" -> "feature", "click" -> "test",
    "view" -> "component", "signup" -> "api_endpoint")

  /** Per entity type: the first three declared attributes are required
    * (the reference prebuilts declare attributes but leave
    * required_attributes to the integrator — types.py:29-32).
    */
  private val Required: Seq[(String, Seq[String])] =
    schema.entityTypes.map(et => et.name -> et.attributes.take(3))

  /** The 8 allowed coding categories + 2 the gate must reject. */
  private val Cats: Seq[String] =
    schema.learningCategories ++ Seq("marketing_tricks", "random_thoughts")

  private def domainValidate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val req = broadcast(Required.toDF("entity_type", "required"))
    val typeCol = TypeMap.foldLeft(lit(null).cast("string")) {
      case (acc, (ev, et)) => when(col("event_type") === ev, lit(et)).otherwise(acc)
    }
    val ents = Tables.events(s, dir).select(
      col("event_id").as("entity_id"),
      typeCol.as("entity_type"),
      element_at(array(Cats.map(lit): _*),
        (col("user_id") % 10).cast("int") + 1).as("category"))
    val allowed = Cats.map(c => c -> schema.isCategoryAllowed(c)).toMap
    ents.join(req, Seq("entity_type"))
      .withColumn("missing", filter(col("required"),
        (a, i) => ((col("entity_id") + i) % (i + lit(2)) === 0).as("m")))
      .select(
        col("entity_id"), col("entity_type"), col("category"),
        col("category").isin(Cats.filter(allowed): _*).cast("int").as("cat_allowed"),
        size(col("missing")).cast("long").as("n_missing"),
        array_join(col("missing"), ",").as("missing_csv"),
        (size(col("missing")) === 0 &&
          col("category").isin(Cats.filter(allowed): _*)).cast("int").as("valid"))
      .orderBy("entity_id")
  }

  private val domainValidateSql: String = {
    def sl(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ", ", "]")
    val reqRows = Required
      .map { case (t, as) => s"('$t', ${sl(as)})" }.mkString(",\n      |    ")
    val typeCase = TypeMap
      .map { case (ev, et) => s"WHEN '$ev' THEN '$et'" }.mkString(" ")
    val allowedList = Cats.filter(schema.isCategoryAllowed)
      .map(c => s"'$c'").mkString(", ")
    s"""WITH req(entity_type, required) AS (VALUES
      |    $reqRows),
      |ents AS (
      |  SELECT event_id AS entity_id,
      |    CASE event_type $typeCase END AS entity_type,
      |    (${sl(Cats)})[(user_id % 10) + 1] AS category
      |  FROM events),
      |v AS (
      |  SELECT e.entity_id, e.entity_type, e.category,
      |    (e.category IN ($allowedList))::INT AS cat_allowed,
      |    list_filter(r.required,
      |      (a, i) -> (e.entity_id + (i - 1)) % ((i - 1) + 2) = 0) AS missing
      |  FROM ents e JOIN req r USING (entity_type))
      |SELECT entity_id, entity_type, category, cat_allowed,
      |  len(missing)::BIGINT AS n_missing,
      |  coalesce(array_to_string(missing, ','), '') AS missing_csv,
      |  (len(missing) = 0 AND cat_allowed = 1)::INT AS valid
      |FROM v ORDER BY entity_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_domain_validate", domainValidate, Some(domainValidateSql)))
}
