package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch pack — the summaries a 100 TB corpus keeps instead
  * of exact per-key state: a Count-Min sketch for heavy-hitter token
  * counts (Cormode & Muthukrishnan 2005) and per-source HyperLogLog
  * cardinality (Flajolet et al. 2007). Both sketches here are built as
  * ordinary bounded aggregates — the CMS is d·w counter cells, the HLL
  * is m registers per source, each the result of one map-side-combined
  * groupBy whose output size is FIXED by the sketch parameters no
  * matter the corpus size — which is exactly why they scale: the
  * shuffle carries sketch cells, not corpus keys, and two sketches of
  * disjoint shards merge by cell-wise (+, max). The hash is the shared
  * 60-bit md5 prefix (`TextAnalysisShared.hash64`), so both engines
  * compute bit-identical sketches and the DuckDB oracle pins every
  * estimate exactly — at the test scale the exact answers are also
  * computable, so each query audits its sketch against truth
  * (overestimate ≥ 0 for CMS; relative error for HLL).
  *
  * Reference behavior being generalized: the reference keeps exact
  * per-type stats dashboards (alma/storage/base.py get_memory_stats);
  * these queries are the bounded-state form those roll-ups need once
  * the corpus outgrows exact per-key counting.
  */
object Sketches {

  // ---- Count-Min sketch -----------------------------------------------
  private val CmsDepth = 4 // independent hash rows
  private val CmsWidth = 512 // counters per row
  private val CmsTopK = 20

  /** h_j(tok): the shared 60-bit hash of "j:tok", mod width. Seeding by
    * row index j inside the hashed string keeps the d rows independent
    * while reusing the one cross-engine hash primitive.
    */
  private def cmsBucket(j: Column, tok: Column): Column =
    pmod(TextAnalysisShared.hash64(concat(j.cast("string"), lit(":"), tok)),
      lit(CmsWidth.toLong))

  /** Exact top-K tokens with their CMS estimates. The sketch build is
    * the scale path (d·w = 2048 cells regardless of corpus size); the
    * exact counts exist at this SF to audit it — `overest` is the
    * sketch's collision overshoot and is provably ≥ 0 (spec-pinned).
    * Probing joins the K·d probe cells against the broadcast sketch.
    */
  private def cmsTopk(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("tok"))
    // One explode feeds both aggregates; Spark schedules them as two
    // scans of the same projection — each map-side-combines before its
    // exchange (cells for the sketch, vocab for the truth).
    val sketch = toks
      .select(explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"), col("tok"))
      .groupBy(col("j"), cmsBucket(col("j"), col("tok")).as("bucket"))
      .agg(count(lit(1)).as("cell"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
      .limit(CmsTopK)
    top
      .select(col("tok"), col("exact_cnt"),
        explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("tok")))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min("cell").as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overest"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  private val cmsTopkSql = {
    val lastJ = CmsDepth - 1
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |cells AS (
       |  SELECT r.range AS j,
       |    ('0x' || substr(md5(r.range || ':' || tok), 1, 15))::BIGINT % $CmsWidth AS bucket,
       |    count(*)::BIGINT AS cell
       |  FROM toks CROSS JOIN range(0, ${lastJ + 1}) r GROUP BY 1, 2),
       |top AS (
       |  SELECT tok, count(*)::BIGINT AS exact_cnt FROM toks GROUP BY 1
       |  ORDER BY exact_cnt DESC, tok LIMIT $CmsTopK),
       |probe AS (
       |  SELECT t.tok, t.exact_cnt, c.cell
       |  FROM top t CROSS JOIN range(0, ${lastJ + 1}) r
       |  JOIN cells c ON c.j = r.range
       |    AND c.bucket = ('0x' || substr(md5(r.range || ':' || t.tok), 1, 15))::BIGINT % $CmsWidth)
       |SELECT tok, exact_cnt, min(cell)::BIGINT AS cms_est,
       |  (min(cell) - exact_cnt)::BIGINT AS overest
       |FROM probe GROUP BY tok, exact_cnt ORDER BY exact_cnt DESC, tok""".stripMargin
  }

  // ---- HyperLogLog ----------------------------------------------------
  private val HllP = 8 // register index bits
  private val HllM = 1 << HllP // 256 registers
  private val HllW = 60 - HllP // value bits feeding the rank

  /** Leading-zero rank of the W-bit value: W − bitlength(v) + 1, via the
    * base-2 string both engines render identically (`bin`); v = 0 (all
    * W bits zero) ranks W + 1 per the paper. bin(v) for v > 0 has no
    * leading zeros, so its length IS floor(log2 v) + 1 with no
    * float-log boundary risk.
    */
  private def hllRho(v: Column): Column =
    when(v === 0L, lit(HllW + 1))
      .otherwise(lit(HllW) - length(bin(v)) + 1)

  /** Per-source distinct-token estimate vs truth. Register state is one
    * groupBy (source, register) max-rank — ≤ sources·m rows out of the
    * exchange at any corpus size; the estimator folds absent registers
    * in closed form (an absent register contributes 2⁻⁰ = 1 to the
    * harmonic sum and counts as a zero register), so no register
    * scaffold frame is ever materialized. Small-range branch is the
    * paper's linear counting; both engines evaluate the identical
    * expression tree.
    */
  private def hllCardinality(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val hashed = toks.select(col("source"),
      TextAnalysisShared.hash64(col("tok")).as("h"))
    // shiftright, not `/`: a double division on a 60-bit hash loses the
    // low bits past 2^53 and would silently diverge from the oracle's
    // integer `//`.
    val regs = hashed
      .groupBy(col("source"), pmod(col("h"), lit(HllM.toLong)).as("reg"))
      .agg(max(hllRho(shiftright(col("h"), HllP))).as("rank"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllM.toDouble))
    val perSource = regs.groupBy("source").agg(
      (sum(pow(lit(2.0), -col("rank"))) +
        (lit(HllM.toDouble) - count(lit(1)))).as("harm"),
      (lit(HllM) - count(lit(1))).cast("long").as("zeros"))
    val raw = alpha * lit(HllM.toDouble) * lit(HllM.toDouble) / col("harm")
    val est = when(raw <= lit(2.5 * HllM) && col("zeros") > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
      .otherwise(raw)
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("tok")).as("exact_distinct"))
    perSource
      .select(col("source"), round(est, 2).as("hll_est"), col("zeros"))
      .join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("hll_est"), col("zeros"),
        round(abs(col("hll_est") - col("exact_distinct")) /
          col("exact_distinct"), 3).as("rel_err"))
      .orderBy("source")
  }

  private val hllCardinalitySql =
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hashed AS (
       |  SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       |regs AS (
       |  SELECT source, h % $HllM AS reg,
       |    max(CASE WHEN h // $HllM = 0 THEN ${HllW + 1}
       |             ELSE $HllW - length(bin(h // $HllM)) + 1 END) AS rank
       |  FROM hashed GROUP BY 1, 2),
       |per_source AS (
       |  SELECT source,
       |    sum(pow(2.0, -rank)) + ($HllM.0 - count(*)) AS harm,
       |    ($HllM - count(*))::BIGINT AS zeros
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT source, zeros,
       |    CASE WHEN (0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0 * $HllM.0 / harm
       |              <= ${2.5 * HllM} AND zeros > 0
       |         THEN $HllM.0 * ln($HllM.0 / zeros)
       |         ELSE (0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0 * $HllM.0 / harm
       |    END AS raw_est
       |  FROM per_source),
       |exact AS (
       |  SELECT source, count(DISTINCT tok)::BIGINT AS exact_distinct
       |  FROM toks GROUP BY 1)
       |SELECT e.source, x.exact_distinct, round(e.raw_est, 2) AS hll_est, e.zeros,
       |  round(abs(round(e.raw_est, 2) - x.exact_distinct) / x.exact_distinct, 3) AS rel_err
       |FROM est e JOIN exact x USING (source) ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_cms_topk", cmsTopk, Some(cmsTopkSql)),
    Q("q_hll_cardinality", hllCardinality, Some(hllCardinalitySql)))
}
