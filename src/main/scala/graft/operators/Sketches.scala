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
  private[graft] val CmsDepth = 4 // independent hash rows
  private[graft] val CmsWidth = 512 // counters per row
  private val CmsTopK = 20

  /** h_j(tok): the shared 60-bit hash of "j:tok", mod width. Seeding by
    * row index j inside the hashed string keeps the d rows independent
    * while reusing the one cross-engine hash primitive.
    */
  private[graft] def cmsBucket(j: Column, tok: Column): Column =
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
    // ONE corpus aggregate (tok → count) feeds both the sketch and the
    // truth. The sketch then hashes the VOCABULARY, not the token
    // stream: summing per-token counts into a (j, bucket) cell is
    // definitionally the cell's occurrence count, and the d md5 rows
    // run vocab×d times instead of occurrences×d — on a corpus where
    // tokens repeat (every corpus) that is the difference between
    // hashing the data and hashing its dictionary. Catalyst reuses the
    // counts exchange across the two consumers (ReusedExchange), so
    // the corpus is tokenized once.
    val cnts = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val sketch = cnts
      .select(explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"),
        col("tok"), col("exact_cnt"))
      .groupBy(col("j"), cmsBucket(col("j"), col("tok")).as("bucket"))
      .agg(sum("exact_cnt").as("cell"))
    val top = cnts
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
  private[graft] val HllP = 8 // register index bits
  private[graft] val HllM = 1 << HllP // 256 registers
  private val HllW = 60 - HllP // value bits feeding the rank

  /** Leading-zero rank of the W-bit value: W − bitlength(v) + 1, via the
    * base-2 string both engines render identically (`bin`); v = 0 (all
    * W bits zero) ranks W + 1 per the paper. bin(v) for v > 0 has no
    * leading zeros, so its length IS floor(log2 v) + 1 with no
    * float-log boundary risk.
    */
  private[graft] def hllRho(v: Column): Column =
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
    // r16: both the register state and the exact audit are functions of
    // the DISTINCT (source, tok) set — a duplicate token maps to the
    // same (reg, rank), so max-rank over distinct values equals max
    // over all occurrences, and countDistinct IS a count over the
    // distinct set. Deriving both branches from the SAME .distinct()
    // makes their scan → explode → (source, tok) exchange subtrees
    // identical, so AQE's ReuseExchange tokenizes the corpus ONCE (the
    // old shape ran two full spread + explode passes, one per branch);
    // past the shared distinct only sources-sized aggregates move.
    val d = toks.distinct()
    val hashed = d.select(col("source"),
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
    val exact = d.groupBy("source")
      .agg(count(lit(1)).as("exact_distinct"))
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

  // ---- Histogram quantiles --------------------------------------------
  private val QhQuantilesPm = Seq(500L, 900L, 990L) // per-mille targets

  /** Mergeable quantile estimation over an HdrHistogram-style
    * log-quantized histogram: each value keeps its top 3 bits (buckets
    * of width 2^(bitlen−3), ≤ 4 per power of two — a few hundred
    * buckets for ANY long domain), per-bucket counts merge by +, and a
    * quantile estimate is the midpoint of the bucket holding the target
    * rank — relative error ≤ 1/8 BY CONSTRUCTION (exact ≥ 4·width,
    * |midpoint − exact| ≤ width/2), spec-pinned. Everything is integer
    * arithmetic (bit length via `bin`, rank via per-mille ceil
    * division), so both engines agree on every boundary. The running
    * sums are unpartitioned windows over BOUNDED frames: the bucket
    * frame is bit-structure-sized and the exact-audit value frame is
    * bounded by the n_chars domain, not the corpus.
    */
  private def quantileHist(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir).select(col("n_chars").cast("long").as("v"))
    val hist = d
      .selectExpr("v", "CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bl")
      .selectExpr("v", "shiftleft(1L, greatest(bl - 3, 0)) AS p")
      .selectExpr("(v DIV p) * p AS low", "(v DIV p) * p + p - 1 AS high")
      .groupBy("low", "high").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(Window.orderBy("low")))
    val ranks = hist.agg(sum("cnt").as("n"))
      .select(col("n"), explode(array(QhQuantilesPm.map(lit): _*)).as("qpm"))
      .selectExpr("qpm", "(qpm * n + 999) DIV 1000 AS rank")
    val first = ranks.join(cum, col("cum") >= col("rank"))
      .groupBy("qpm", "rank").agg(min("low").as("low"))
    val est = first.join(hist.select("low", "high"), Seq("low"))
      .selectExpr("qpm", "rank", "(low + high) DIV 2 AS est")
    val vc = d.groupBy("v").agg(count(lit(1)).as("c"))
    val cv = vc.withColumn("cum", sum(col("c")).over(Window.orderBy("v")))
    val exact = ranks.join(cv, col("cum") >= col("rank"))
      .groupBy("qpm").agg(min(col("v")).as("exact"))
    est.join(exact, Seq("qpm"))
      .select(col("qpm"), col("rank"), col("est"), col("exact"),
        round(abs(col("est") - col("exact")).cast("double") /
          greatest(col("exact"), lit(1L)), 4).as("rel_err"))
      .orderBy("qpm")
  }

  private val quantileHistSql =
    """WITH d AS (SELECT n_chars::BIGINT AS v FROM documents),
      |h AS (
      |  SELECT (v // p) * p AS low, (v // p) * p + p - 1 AS high,
      |    count(*)::BIGINT AS cnt
      |  FROM (SELECT v,
      |          (1::BIGINT << greatest(
      |            (CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END) - 3, 0)) AS p
      |        FROM d)
      |  GROUP BY 1, 2),
      |c AS (SELECT low, high, sum(cnt) OVER (ORDER BY low)::BIGINT AS cum FROM h),
      |r AS (
      |  SELECT qpm, ((qpm * n + 999) // 1000)::BIGINT AS rank
      |  FROM (SELECT unnest([500, 900, 990]::BIGINT[]) AS qpm)
      |  CROSS JOIN (SELECT sum(cnt)::BIGINT AS n FROM h)),
      |f AS (
      |  SELECT r.qpm, r.rank, min(c.low)::BIGINT AS low
      |  FROM r JOIN c ON c.cum >= r.rank GROUP BY 1, 2),
      |e AS (
      |  SELECT f.qpm, f.rank, ((f.low + h.high) // 2)::BIGINT AS est
      |  FROM f JOIN h ON h.low = f.low),
      |cv AS (
      |  SELECT v, sum(c) OVER (ORDER BY v)::BIGINT AS cum
      |  FROM (SELECT v, count(*)::BIGINT AS c FROM d GROUP BY 1)),
      |x AS (
      |  SELECT r.qpm, min(cv.v)::BIGINT AS exact
      |  FROM r JOIN cv ON cv.cum >= r.rank GROUP BY 1)
      |SELECT e.qpm, e.rank, e.est, x.exact,
      |  round(abs(e.est - x.exact)::DOUBLE / greatest(x.exact, 1), 4) AS rel_err
      |FROM e JOIN x USING (qpm) ORDER BY e.qpm""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_cms_topk", cmsTopk, Some(cmsTopkSql)),
    Q("q_hll_cardinality", hllCardinality, Some(hllCardinalitySql)),
    Q("q_quantile_hist", quantileHist, Some(quantileHistSql)))
}
