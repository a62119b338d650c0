package graft.operators

import graft.Q
import graft.graph.Entity
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Entity detection: the reference's two-pass regex heuristic
  * (reference: alma/extraction/entity_detector.py:401-449 candidate
  * extraction, :465-548 signal scoring, :553-626 classification)
  * re-expressed as ONE corpus pass — a single select computes every
  * signal's match list, one explode tags them, one groupBy(name)
  * aggregates, and classification is pure column arithmetic. No
  * per-candidate re-scan of the text (the reference loops candidates ×
  * full-text regex), no candidate×document join — linear work, one
  * shuffle on name with map-side combine, which is the shape that
  * survives a 100 TB corpus.
  *
  * Simplifications vs the reference, documented: single-word candidates
  * only (no multi-word proper nouns), no pronoun-proximity window (needs
  * ±2-line context; the two-signal-category downgrade branch remains
  * reachable via the other three person categories), and verb matching
  * is case-sensitive on the verb.
  */
object Entities {

  private val NameRe = "[A-Z][a-z0-9]{1,19}"
  private val CandRe = s"\\b($NameRe)\\b"
  private val DiaRe = s"^($NameRe):\\s"
  private val PvRe = s"\\b($NameRe)\\s+(?:said|asked|told|replied|laughed|smiled|cried|felt|thinks?|wants?|loves?|hates?|knows?|decided|pushed|wrote)\\b"
  private val DirRe = s"\\b(?:hey|hi|thanks?|dear)\\s+($NameRe)\\b"
  private val PrjRe = s"\\b(?:building|built|shipping|shipped|launching|launched|deploying|deployed|installing|installed)\\s+($NameRe)\\b"
  private val VerRe = s"\\b($NameRe)(?:\\s+v\\d+|-core|-local)\\b"
  private val CodeRe = s"\\b($NameRe)\\.(?:py|js|ts|yaml|yml|json|sh)\\b"

  // Capitalized-token stopword slice of entity_detector.py's STOPWORDS.
  private val Stop = Seq(
    "the", "a", "an", "and", "or", "but", "if", "then", "when", "in", "on",
    "at", "to", "for", "of", "with", "by", "from", "as", "is", "was", "he",
    "she", "they", "it", "this", "that", "we", "you", "i", "memory", "model",
    "system", "data", "training", "inference", "network")

  /** Detect entities over a corpus: returns one row per candidate name
    * appearing ≥ minFrequency times, classified person / project /
    * uncertain with the reference's ratio + two-signal-category rule.
    */
  def detect(df: DataFrame, text: Column, minFrequency: Int = 3): DataFrame = {
    def tagged(re: String, tag: String) =
      transform(regexp_extract_all(text, lit(re), lit(1)),
        x => struct(x.as("name"), lit(tag).as("sig")))
    val hits = df
      .select(explode(concat(
        tagged(CandRe, "freq"), tagged(DiaRe, "dia"), tagged(PvRe, "pv"),
        tagged(DirRe, "dir"), tagged(PrjRe, "prj"), tagged(VerRe, "ver"),
        tagged(CodeRe, "ver"))).as("h"))
      .select(col("h.name").as("name"), col("h.sig").as("sig"))
      .filter(!lower(col("name")).isin(Stop: _*))
    val cnt = (t: String) => sum(when(col("sig") === t, 1L).otherwise(0L))
    val agg = hits.groupBy("name")
      .agg(cnt("freq").as("frequency"), cnt("dia").as("n_dia"),
        cnt("pv").as("n_pv"), cnt("dir").as("n_dir"),
        cnt("prj").as("n_prj"), cnt("ver").as("n_ver"))
      .filter(col("frequency") >= minFrequency)
    // Weights: dialogue 3, person-verb 2, direct address 4; project-verb
    // 2, versioned/code-ref 3 (entity_detector.py:488-541).
    val ps = lit(3L) * col("n_dia") + lit(2L) * col("n_pv") + lit(4L) * col("n_dir")
    val prs = lit(2L) * col("n_prj") + lit(3L) * col("n_ver")
    val total = ps + prs
    val ratio = ps.cast("double") / total.cast("double")
    val ncat = when(col("n_dia") > 0, 1).otherwise(0) +
      when(col("n_pv") > 0, 1).otherwise(0) +
      when(col("n_dir") > 0, 1).otherwise(0)
    val isPerson = ratio >= 0.7 && ncat >= 2 && ps >= 5L
    val typ = when(total === 0L, lit("uncertain"))
      .when(isPerson, lit("person"))
      .when(ratio >= 0.7, lit("uncertain"))
      .when(ratio <= 0.3, lit("project"))
      .otherwise(lit("uncertain"))
    val conf = round(
      when(total === 0L, least(lit(0.4), col("frequency").cast("double") / lit(50.0)))
        .when(isPerson, least(lit(0.99), lit(0.5) + ratio * lit(0.5)))
        .when(ratio >= 0.7, lit(0.4))
        .when(ratio <= 0.3, least(lit(0.99), lit(0.5) + (lit(1.0) - ratio) * lit(0.5)))
        .otherwise(lit(0.5)), 2)
    agg.select(col("name"), typ.as("entity_type"), conf.as("confidence"),
        col("frequency"), ps.as("person_score"), prs.as("project_score"))
      .orderBy(col("confidence").desc, col("name"))
  }

  /** Detected rows as graph entities (entity_detector.py:664-676),
    * feeding GraphStore.entities.
    */
  def toEntities(detected: DataFrame): Dataset[Entity] = {
    val spark = detected.sparkSession
    import spark.implicits._
    detected.select(
      concat(lit("detected-"), lower(col("name"))).as("id"),
      col("name"),
      col("entity_type").as("entityType"),
      map(lit("confidence"), col("confidence").cast("string"),
        lit("frequency"), col("frequency").cast("string"),
        lit("detection_method"), lit("regex_heuristic")).as("properties"))
      .as[Entity]
  }

  // Oracle query: the synthetic corpus is lowercase word soup, so the
  // query first renders each document as a conversation line — speaker =
  // capitalized source, signal form keyed on lang — then runs the real
  // detector. Classification outcomes are data-driven: each source's
  // person/project ratio is its lang mix.
  /** The conversation rendering shared by detection and the co-mention
    * graph (speaker = capitalized source, signal form keyed on lang).
    */
  private def convCol: Column = {
    val spk = concat(upper(expr("substr(source, 1, 1)")), expr("substr(source, 2)"))
    concat(
      when(col("lang") === "en", concat(spk, lit(": "), col("text")))
        .when(col("lang") === "fr", concat(spk, lit(" said "), col("text")))
        .when(col("lang") === "de", concat(lit("thanks "), spk, lit(" for "), col("text")))
        .when(col("lang") === "es", concat(lit("deployed "), spk, lit(" with "), col("text")))
        .otherwise(concat(spk, lit(" v2 "), col("text"))),
      lit(" deployed Kit"), col("lang"), lit(" and Corpus"))
  }

  private def entityDetect(s: SparkSession, dir: String): DataFrame =
    detect(Tables.spread(Tables.documents(s, dir)).select(convCol.as("conv")),
      col("conv"))

  private val stopList = Stop.map(w => s"'$w'").mkString(", ")

  private val entityDetectSql =
    s"""WITH r AS (
       |  SELECT (CASE lang
       |    WHEN 'en' THEN upper(substr(source, 1, 1)) || substr(source, 2) || ': ' || text
       |    WHEN 'fr' THEN upper(substr(source, 1, 1)) || substr(source, 2) || ' said ' || text
       |    WHEN 'de' THEN 'thanks ' || upper(substr(source, 1, 1)) || substr(source, 2) || ' for ' || text
       |    WHEN 'es' THEN 'deployed ' || upper(substr(source, 1, 1)) || substr(source, 2) || ' with ' || text
       |    ELSE upper(substr(source, 1, 1)) || substr(source, 2) || ' v2 ' || text END)
       |    || ' deployed Kit' || lang || ' and Corpus' AS conv
       |  FROM documents),
       |h AS (
       |  SELECT unnest(regexp_extract_all(conv, '$CandRe', 1)) AS name, 'freq' AS sig FROM r
       |  UNION ALL SELECT unnest(regexp_extract_all(conv, '$DiaRe', 1)), 'dia' FROM r
       |  UNION ALL SELECT unnest(regexp_extract_all(conv, '$PvRe', 1)), 'pv' FROM r
       |  UNION ALL SELECT unnest(regexp_extract_all(conv, '$DirRe', 1)), 'dir' FROM r
       |  UNION ALL SELECT unnest(regexp_extract_all(conv, '$PrjRe', 1)), 'prj' FROM r
       |  UNION ALL SELECT unnest(regexp_extract_all(conv, '$VerRe', 1)), 'ver' FROM r
       |  UNION ALL SELECT unnest(regexp_extract_all(conv, '$CodeRe', 1)), 'ver' FROM r),
       |a AS (
       |  SELECT name,
       |    sum(CASE WHEN sig = 'freq' THEN 1 ELSE 0 END)::BIGINT AS frequency,
       |    sum(CASE WHEN sig = 'dia' THEN 1 ELSE 0 END)::BIGINT AS n_dia,
       |    sum(CASE WHEN sig = 'pv' THEN 1 ELSE 0 END)::BIGINT AS n_pv,
       |    sum(CASE WHEN sig = 'dir' THEN 1 ELSE 0 END)::BIGINT AS n_dir,
       |    sum(CASE WHEN sig = 'prj' THEN 1 ELSE 0 END)::BIGINT AS n_prj,
       |    sum(CASE WHEN sig = 'ver' THEN 1 ELSE 0 END)::BIGINT AS n_ver
       |  FROM h WHERE lower(name) NOT IN ($stopList)
       |  GROUP BY name
       |  HAVING sum(CASE WHEN sig = 'freq' THEN 1 ELSE 0 END) >= 3),
       |s AS (
       |  SELECT name, frequency,
       |    3 * n_dia + 2 * n_pv + 4 * n_dir AS ps,
       |    2 * n_prj + 3 * n_ver AS prs,
       |    (CASE WHEN n_dia > 0 THEN 1 ELSE 0 END + CASE WHEN n_pv > 0 THEN 1 ELSE 0 END
       |     + CASE WHEN n_dir > 0 THEN 1 ELSE 0 END) AS ncat,
       |    (3 * n_dia + 2 * n_pv + 4 * n_dir)::DOUBLE
       |      / NULLIF(3 * n_dia + 2 * n_pv + 4 * n_dir + 2 * n_prj + 3 * n_ver, 0)::DOUBLE AS ratio
       |  FROM a)
       |SELECT name,
       |  CASE WHEN ps + prs = 0 THEN 'uncertain'
       |       WHEN ratio >= 0.7 AND ncat >= 2 AND ps >= 5 THEN 'person'
       |       WHEN ratio >= 0.7 THEN 'uncertain'
       |       WHEN ratio <= 0.3 THEN 'project'
       |       ELSE 'uncertain' END AS entity_type,
       |  round(CASE WHEN ps + prs = 0 THEN least(0.4::DOUBLE, frequency::DOUBLE / 50.0)
       |       WHEN ratio >= 0.7 AND ncat >= 2 AND ps >= 5 THEN least(0.99::DOUBLE, 0.5 + ratio * 0.5)
       |       WHEN ratio >= 0.7 THEN 0.4::DOUBLE
       |       WHEN ratio <= 0.3 THEN least(0.99::DOUBLE, 0.5 + (1.0 - ratio) * 0.5)
       |       ELSE 0.5::DOUBLE END, 2) AS confidence,
       |  frequency, ps::BIGINT AS person_score, prs::BIGINT AS project_score
       |FROM s ORDER BY confidence DESC, name""".stripMargin

  // -------------------------------------------------------------------
  // q_entity_pagerank — entity importance via 2 fixed PageRank
  // iterations over the co-mention graph: nodes are the detector's
  // candidate names, an (undirected) edge connects two names mentioned
  // in the same rendered conversation. Beyond-reference: the reference
  // stops at per-entity frequency scoring; importance over the mention
  // GRAPH is what ranks entities once the corpus is too big to eyeball.
  // Scale shape: the pair generator joins name sets ONLY within one
  // doc_id (co-partitioned equi-join, never all-pairs across docs);
  // edges/degrees/rank updates are node- and edge-sized aggregates with
  // map-side combine — the canonical iterative-graph Spark workload
  // with a fixed round budget, every rank rounded per iteration so both
  // engines iterate from identical vectors.
  private val PrDamping = 0.85
  private val PrTopK = 20

  private def entityPagerank(s: SparkSession, dir: String): DataFrame = {
    val conv = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), convCol.as("conv"))
    val names = conv
      .select(col("doc_id"), explode(array_distinct(
        regexp_extract_all(col("conv"), lit(CandRe), lit(1)))).as("name"))
      .filter(!lower(col("name")).isin(Stop: _*))
    val half = names.as("a").join(names.as("b"), Seq("doc_id"))
      .filter(col("a.name") < col("b.name"))
      .select(col("a.name").as("src"), col("b.name").as("dst"))
      .distinct()
    // r16: the out-degree rides ON the checkpointed edge list (one
    // window over the edge build, before the checkpoint) instead of
    // being a groupBy re-derived from it at every use — the old lazy
    // tree recomputed `deg` and its join once per iteration and again
    // for the final projection (two shuffle joins per iteration; now
    // one), and `n`/`pr₀` re-aggregated the same frame. Each
    // iteration is now exactly one edge ⋈ rank join + one node-sized
    // aggregate — the canonical PageRank step — and the per-iteration
    // round(_, 9) keeps the rank vector identical to the oracle's.
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint(true) // read per iteration + degrees + final
    val deg = edges.groupBy("src").agg(first(col("deg")).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(n))
      .select(col("src").as("name"), round(lit(1.0) / col("n"), 9).as("pr"))
    for (_ <- 1 to 2) {
      val contrib = edges
        .join(pr, col("src") === col("name"))
        .groupBy(col("dst")).agg(sum(col("pr") / col("deg")).as("in_pr"))
      pr = contrib.crossJoin(broadcast(n))
        .select(col("dst").as("name"),
          round(lit(1 - PrDamping) / col("n") + lit(PrDamping) * col("in_pr"), 9)
            .as("pr"))
    }
    pr.join(deg, col("name") === col("src"))
      .select(col("name"), col("deg"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("pagerank").desc, col("name"))
      .limit(PrTopK)
  }

  private val entityPagerankSql =
    s"""WITH r AS (
       |  SELECT doc_id, (CASE lang
       |    WHEN 'en' THEN upper(substr(source, 1, 1)) || substr(source, 2) || ': ' || text
       |    WHEN 'fr' THEN upper(substr(source, 1, 1)) || substr(source, 2) || ' said ' || text
       |    WHEN 'de' THEN 'thanks ' || upper(substr(source, 1, 1)) || substr(source, 2) || ' for ' || text
       |    WHEN 'es' THEN 'deployed ' || upper(substr(source, 1, 1)) || substr(source, 2) || ' with ' || text
       |    ELSE upper(substr(source, 1, 1)) || substr(source, 2) || ' v2 ' || text END)
       |    || ' deployed Kit' || lang || ' and Corpus' AS conv
       |  FROM documents),
       |names AS (
       |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(conv, '$CandRe', 1)) AS name
       |  FROM r),
       |nf AS (SELECT doc_id, name FROM names WHERE lower(name) NOT IN ($stopList)),
       |half AS (
       |  SELECT DISTINCT a.name AS src, b.name AS dst
       |  FROM nf a JOIN nf b USING (doc_id) WHERE a.name < b.name),
       |edges AS (
       |  SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT count(*)::BIGINT AS n FROM deg),
       |p0 AS (SELECT src AS name, round(1.0 / n, 9) AS pr FROM deg CROSS JOIN nn),
       |p1 AS (
       |  SELECT e.dst AS name,
       |    round((1 - $PrDamping) / any_value(nn.n) +
       |      $PrDamping * sum(p0.pr / d.deg), 9) AS pr
       |  FROM edges e JOIN p0 ON p0.name = e.src JOIN deg d ON d.src = e.src
       |  CROSS JOIN nn GROUP BY 1),
       |p2 AS (
       |  SELECT e.dst AS name,
       |    round((1 - $PrDamping) / any_value(nn.n) +
       |      $PrDamping * sum(p1.pr / d.deg), 9) AS pr
       |  FROM edges e JOIN p1 ON p1.name = e.src JOIN deg d ON d.src = e.src
       |  CROSS JOIN nn GROUP BY 1)
       |SELECT p2.name, deg.deg, round(p2.pr, 6) AS pagerank
       |FROM p2 JOIN deg ON deg.src = p2.name
       |ORDER BY pagerank DESC, p2.name LIMIT $PrTopK""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_entity_detect", entityDetect, Some(entityDetectSql)),
    Q("q_entity_pagerank", entityPagerank, Some(entityPagerankSql)))
}
