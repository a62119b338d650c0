package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical search pack: TF-IDF, BM25, and Reciprocal Rank Fusion — the
  * Spark expression of the reference's text/hybrid search (reference:
  * alma/retrieval/text_search.py:46-194 TF-IDF + BM25;
  * alma/retrieval/hybrid.py:113-178 RRF with k=60 and normalized
  * weights).
  *
  * The corpus statistics (DF, avgdl, N) are tiny aggregates that Spark
  * broadcasts; the token explode is the only wide operation and shuffles
  * on (doc_id, term) — both properties hold at 100 TB. The final global
  * rank for RRF is a top-k over doc scores, which collapses to a
  * TakeOrderedAndProject; the rank windows here are over the (small)
  * per-query result set, not the corpus.
  */
object TextSearch {

  private val Bm25Terms = Seq("data", "join", "spark")
  private val K1 = 1.2
  private val B = 0.75

  // No spread here: tokenize+explode is light enough per row that the
  // round-robin exchange costs more than the parallelism buys (measured
  // 1.4 s → 3.2 s for q_tfidf_topterms with a spread at sf0.1).
  private def tok(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  // V5 TF-IDF: per-doc top-5 terms by tf*ln(N/df).
  private def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val t = tok(s, dir)
    val tf = t.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df derived from tf ((doc_id, term) rows are distinct, so count(*)
    // per term ≡ countDistinct(doc_id) over the token stream), as an
    // AGGREGATE, not a term-partitioned window: the aggregate keeps
    // map-side partial combine, so a stop-word term shuffles one
    // partial count per task instead of funneling every row of that
    // term into a single window partition — the difference between
    // fine and catastrophic at 100 TB.
    //
    // The counted expression REFERENCES tf (count of `tf >= 1`, which
    // holds for every row, so the value is count(*) exactly) so that
    // column pruning cannot strip the partial_count from this branch's
    // exchange: with the count kept, the exchange subtree is
    // byte-identical to the tf branch's and AQE's ReuseExchange runs
    // the scan + explode + (doc_id, term) shuffle ONCE for both (the
    // pruned form re-scanned and re-exploded the whole corpus for df).
    val df = tf.groupBy("term").agg(count(when(col("tf") >= 1, 1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("doc_id", "rn", "term", "tfidf")
      .orderBy("doc_id", "rn")
  }

  private val tfidfSql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(*)::BIGINT AS n FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n / df.df), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, rn, term, tfidf FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      |  FROM sc) t
      |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin

  /** BM25 scores for the fixed query, unlimited (shared by bm25 top-k and
    * RRF). Okapi BM25 with k1=1.2, b=0.75.
    *
    * Shape (r16): the query terms are a 3-element constant, so per-doc
    * term frequencies are `size(filter(toks, _ == term))` — a pure
    * projection — and doc length is `#spaces + 1` (split on a single
    * space yields exactly separator-count + 1 fields, so this equals
    * the exploded-token count the old groupBy measured, including the
    * one empty token of an empty text). That removes BOTH full token
    * explodes, the corpus-sized groupBy(doc_id) for dl, and the
    * dl-join: tf rows carry dl with them. avgdl and N fold into ONE
    * single-row aggregate (they were two separate corpus scans). The
    * only corpus-sized exchange left is the per-doc score aggregate
    * over ≤ |terms| rows per doc; every per-row arithmetic expression
    * is unchanged, so scores are bit-identical.
    */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .cast("long").as("dl"))
    val stats = base.agg(avg("dl").as("avgdl"), count(lit(1)).as("n"))
    val tf = base
      .select(col("doc_id"), col("dl"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("dl"),
        explode(array(Bm25Terms.map(t0 =>
          struct(lit(t0).as("term"),
            size(filter(col("toks"), x => x === lit(t0))).cast("long").as("tf"))): _*))
          .as("e"))
      .select(col("doc_id"), col("dl"), col("e.term").as("term"), col("e.tf").as("tf"))
      .filter(col("tf") > 0)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(idf * tfNorm), 6).as("bm25"))
  }

  private val bm25ScoresSql =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
      |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
      |n AS (SELECT count(*)::BIGINT AS n FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
      |       WHERE term IN ('data', 'join', 'spark') GROUP BY 1, 2),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |bm AS (
      |  SELECT tf.doc_id,
      |    round(sum(
      |      ln(1.0::DOUBLE + (n.n - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE)) *
      |      (tf.tf * 2.2::DOUBLE / (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / avgdl.avgdl)))
      |    ), 6) AS bm25
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN avgdl CROSS JOIN n
      |  GROUP BY tf.doc_id)""".stripMargin

  // V6 BM25 top-20 for the fixed query.
  private def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25Scores(s, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  private val bm25TopKSql =
    s"""WITH $bm25ScoresSql
       |SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** Candidate-list cap per ranker: RRF fuses bounded top-N lists (the
    * reference fuses two retriever result lists, hybrid.py:113-178), so
    * each ranking window runs over a TakeOrderedAndProject'd candidate
    * set — never an unpartitioned window over the raw corpus.
    */
  private val RrfCandidates = 100

  // V7 RRF: fuse the BM25 ranking with a doc-length ranking, k=60.
  private def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val wa = Window.orderBy(col("bm25").desc, col("doc_id"))
    val ra = bm25Scores(s, dir)
      .orderBy(col("bm25").desc, col("doc_id")).limit(RrfCandidates)
      .withColumn("rank_a", row_number().over(wa).cast("long"))
      .select("doc_id", "rank_a")
    val wb = Window.orderBy(col("n_chars").desc, col("doc_id"))
    val rb = Tables.documents(s, dir)
      .orderBy(col("n_chars").desc, col("doc_id")).limit(RrfCandidates)
      .withColumn("rank_b", row_number().over(wb).cast("long"))
      .select("doc_id", "rank_b")
    ra.join(rb, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("rank_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("rank_b")), lit(0.0)), 6))
      .select("doc_id", "rank_a", "rank_b", "rrf")
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  private val rrfFusionSql =
    s"""WITH $bm25ScoresSql,
       |ra AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_a
       |       FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100) ba),
       |rb AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_b
       |       FROM (SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100) bb)
       |SELECT doc_id, rank_a, rank_b,
       |  round(coalesce(1.0::DOUBLE / (60 + rank_a), 0.0) + coalesce(1.0::DOUBLE / (60 + rank_b), 0.0), 6) AS rrf
       |FROM ra FULL OUTER JOIN rb USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_tfidf_topterms", tfidfTopTerms, Some(tfidfSql)),
    Q("q_bm25_topk", bm25TopK, Some(bm25TopKSql)),
    Q("q_rrf_fusion", rrfFusion, Some(rrfFusionSql)))
}
