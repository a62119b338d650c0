package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016) — the step
  * that PRODUCES the merge tables `q_bpe_tokens`/`q_bpe_fertility`
  * consume. The classic trainer trick makes this cheap at any corpus
  * size: one map-side-combined aggregate collapses the corpus to its
  * (word, count) vocabulary, and every training round after that runs
  * on the bounded vocab frame — pair counting is a explode over
  * per-word symbol arrays weighted by word count, the argmax merge is a
  * 1-row frame, and applying it is a greedy left fold over each word's
  * symbols (the same left-to-right scan reference BPE implementations
  * use, here as a codegen'd `aggregate` HOF — no UDF). The chosen merge
  * stays a DataFrame end-to-end (crossJoin of a broadcast 1-row frame),
  * so no round ever collects to the driver.
  *
  * Scale shape: corpus → vocab is the only corpus-sized exchange
  * (map-side combine leaves vocab-sized partials); each round's pair
  * aggregate is bounded by distinct symbol pairs, and the merge apply
  * is a pure projection of the vocab frame. A 100 TB corpus trains in
  * R vocab-sized rounds after one corpus scan.
  *
  * Output: the first R learned merges as (round, lhs, rhs, pair_cnt) —
  * argmax ties broken by (lhs, rhs) so both engines learn the
  * identical table.
  */
object TokenizerTrain {

  private val BpeRounds = 3

  /** (w, cnt, syms): the corpus vocabulary with per-character symbol
    * arrays. Empty tokens (doubled separators) carry no pair signal and
    * would make `sequence(1, 0)` run DESCENDING — filtered on both
    * engines.
    */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))

  /** Adjacent-symbol pair counts over the vocab, weighted by word
    * count.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(
        when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("cnt")).as("pair_cnt"))

  /** The round's merge: highest pair count, ties by (lhs, rhs). */
  private def top1(pairs: DataFrame): DataFrame =
    pairs.orderBy(col("pair_cnt").desc, col("lhs"), col("rhs")).limit(1)

  /** Greedy left-to-right merge application: fold each word's symbols,
    * joining the last accumulated symbol with the current one whenever
    * they equal the merge pair — the same scan order reference BPE
    * uses, so "aaa" under (a,a) becomes [aa, a]. `try_element_at`
    * (not `element_at`): ANSI mode errors on the empty-accumulator
    * probe, and AND does not guarantee short-circuit order.
    */
  private def applyMerge(words: DataFrame, merge: DataFrame): DataFrame =
    words
      .crossJoin(broadcast(merge.select(col("lhs").as("ml"), col("rhs").as("mr"))))
      .select(col("w"), col("cnt"),
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, x) => when(
            try_element_at(acc, lit(-1)) === col("ml") && x === col("mr"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(col("ml"), col("mr")))))
            .otherwise(concat(acc, array(x)))).as("syms"))

  /** The training loop's full trace: (merge frame, words-after-merge)
    * per round, over the materialized vocab. The vocab is bounded and
    * every round re-reads it — localCheckpoint instead of re-running
    * the corpus aggregate per round. Each round's merge row and
    * post-merge vocab are ALSO checkpointed (r16): both have ≥ 2
    * downstream consumers (the merge feeds applyMerge and the output
    * union; round r's words feed round r+1's pair counts, its apply,
    * and the compression-curve aggregate), and without materialization
    * the lazy trees replicate every earlier round's explode + argmax +
    * fold per consumer — q_bpe_compression's initial plan carried 52
    * Exchanges for a 3-round trainer. All frames are vocab-sized or
    * 1-row, never corpus-sized.
    */
  private def trainRounds(s: SparkSession, dir: String)
      : (DataFrame, Seq[(DataFrame, DataFrame)]) = {
    val w0 = vocab(s, dir).localCheckpoint(true)
    var words = w0
    (w0, (1 to BpeRounds).map { r =>
      val m = top1(pairCounts(words)).localCheckpoint(true)
      words = applyMerge(words, m).localCheckpoint(true)
      (m.select(lit(r).as("round"), col("lhs"), col("rhs"), col("pair_cnt")),
        words)
    })
  }

  private def bpeTrain(s: SparkSession, dir: String): DataFrame =
    trainRounds(s, dir)._2.map(_._1).reduce(_ unionByName _).orderBy("round")

  /** The trainer→tokenizer handoff audited as a compression curve:
    * corpus token count after 0..R merges (round 0 = raw characters of
    * the non-empty words). Each round with a positive pair count must
    * strictly shrink the corpus — spec-pinned; at full vocab size this
    * curve is the fertility trajectory a tokenizer team actually tracks
    * while training.
    */
  private def bpeCompression(s: SparkSession, dir: String): DataFrame = {
    val (w0, rounds) = trainRounds(s, dir)
    def sizeOf(words: DataFrame, r: Int): DataFrame =
      words.agg(sum(size(col("syms")) * col("cnt")).as("total_tokens"))
        .select(lit(r).as("round"), col("total_tokens"))
    (sizeOf(w0, 0) +: rounds.zipWithIndex.map { case ((_, w), i) => sizeOf(w, i + 1) })
      .reduce(_ unionByName _).orderBy("round")
  }

  // One round as oracle CTEs: pair counts from the given words CTE,
  // argmax, apply — shared by the trainer and the compression curve so
  // the round formula exists in one copy.
  private def pairsCteSql(words: String, g: String, m: String): String =
    s"""$g AS (
       |  SELECT p.l AS lhs, p.r AS rhs, sum(cnt)::BIGINT AS pair_cnt FROM (
       |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
       |      i -> {'l': syms[i], 'r': syms[i + 1]})) AS p
       |    FROM $words) GROUP BY 1, 2),
       |$m AS (SELECT lhs, rhs, pair_cnt FROM $g
       |  ORDER BY pair_cnt DESC, lhs, rhs LIMIT 1)""".stripMargin

  // The merge joins in as plain columns (DuckDB rejects subqueries
  // inside lambda bodies) — m is 1 row, so the cross join is a
  // broadcast of the merge pair, same shape as the Spark side.
  private def applyCteSql(words: String, m: String, out: String): String =
    s"""$out AS (
       |  SELECT w, cnt,
       |    list_reduce(list_transform(syms, x -> [x]),
       |      (acc, x) -> CASE
       |        WHEN acc[len(acc)] = m.lhs AND x[1] = m.rhs
       |        THEN list_append(list_slice(acc, 1, len(acc) - 1), m.lhs || m.rhs)
       |        ELSE list_append(acc, x[1]) END) AS syms
       |  FROM $words CROSS JOIN $m m)""".stripMargin

  private val bpeTrainSql = {
    def pairsCte(words: String, g: String, m: String) = pairsCteSql(words, g, m)
    def applyCte(words: String, m: String, out: String) = applyCteSql(words, m, out)
    s"""WITH vocab AS (
       |  SELECT w, count(*)::BIGINT AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1),
       |w0 AS (
       |  SELECT w, cnt, list_transform(range(1, length(w) + 1), i -> w[i:i]) AS syms
       |  FROM vocab),
       |${pairsCte("w0", "g1", "m1")},
       |${applyCte("w0", "m1", "w1")},
       |${pairsCte("w1", "g2", "m2")},
       |${applyCte("w1", "m2", "w2")},
       |${pairsCte("w2", "g3", "m3")}
       |SELECT 1 AS round, lhs, rhs, pair_cnt FROM m1
       |UNION ALL SELECT 2, lhs, rhs, pair_cnt FROM m2
       |UNION ALL SELECT 3, lhs, rhs, pair_cnt FROM m3
       |ORDER BY round""".stripMargin
  }

  private val bpeCompressionSql = {
    // Reuse the training chain's CTE builders up through w3.
    val prefix = bpeTrainSql.substring(0, bpeTrainSql.indexOf("\nSELECT 1 AS round"))
    def sz(w: String, r: Int) =
      s"SELECT $r AS round, sum(len(syms) * cnt)::BIGINT AS total_tokens FROM $w"
    s"""$prefix,
       |${applyCteSql("w2", "m3", "w3")}
       |${sz("w0", 0)}
       |UNION ALL ${sz("w1", 1)}
       |UNION ALL ${sz("w2", 2)}
       |UNION ALL ${sz("w3", 3)}
       |ORDER BY round""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_bpe_train", bpeTrain, Some(bpeTrainSql)),
    Q("q_bpe_compression", bpeCompression, Some(bpeCompressionSql)))
}
