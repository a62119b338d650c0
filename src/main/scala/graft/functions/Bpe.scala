package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer — the tokenizer-primary half of
  * the reference's token accounting (alma/utils/tokenizer.py:21-520
  * tiktoken-primary, chars/4 estimator fallback budget.py:131-152).
  * Training is the classic two-altitude split: one distributed corpus
  * pass builds the pretoken VOCABULARY with frequencies (bounded by
  * distinct pretokens — O(100k) for natural text regardless of corpus
  * size, the same reason real BPE trainers work on word-frequency
  * dicts), then the merge loop runs on the driver over that bounded
  * table. Encoding is a pure per-row column expression (codegen'd
  * built-ins, ANSI-expressible so the oracle can replicate it).
  *
  * Representation trick shared by the Scala, Column, and oracle-SQL
  * implementations: a word is its characters wrapped as `|c|` symbols
  * concatenated (`"abc"` → `"|a||b||c|"`), so applying merge (a, b) is
  * the literal replace `|a||b|` → `|ab|`. Left-to-right non-overlapping
  * replacement — the semantics of Java's `String.replace`, Spark's
  * `replace`, and DuckDB's `replace` alike — is exactly BPE's greedy
  * merge application, and because symbols never contain `|`, a pattern
  * can only ever match whole symbols. The subword count of a word is
  * then pipes/2.
  */
object Bpe {

  /** Pretokenizer classes (lookahead-free so Java regex and RE2 agree):
    * letter runs, digit runs, other non-space-non-pipe runs. Spaces
    * separate pretokens and are not counted (simpler than GPT-2's
    * leading-space convention; the estimator's job is budget
    * accounting, not model parity). The pipe is excluded because it is
    * the wrap delimiter — a symbol containing `|` would make merge
    * patterns ambiguous, so pipes are treated like whitespace.
    */
  val PretokenRe = "[a-z]+|[0-9]+|[^a-z0-9 |]+"

  /** Linear-scan pretokenizer — the compiled twin of
    * `regexp_extract_all(text, PretokenRe)`: spaces and pipes match no
    * alternative (they separate pretokens), every other char belongs
    * to exactly one class (letter run, digit run, other run), and the
    * ordered-alternation regex on such a partition is just maximal
    * same-class runs. A regex engine pays backtracking bookkeeping per
    * char; at 100 TB the pretokenization pass IS the tokenizer cost,
    * so the hot paths (the vocab scan, the per-row counter) call this
    * and the regex stays as the parity ground truth (`KernelProps`
    * pins scanner == regex over an adversarial alphabet, BpeSpec over
    * the real corpus). Surrogate pairs: both halves are "other" class,
    * so they extend one run exactly like the code-point regex.
    */
  def pretokens(text: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    private def cls(c: Char): Int =
      if (c >= 'a' && c <= 'z') 0
      else if (c >= '0' && c <= '9') 1
      else if (c == ' ' || c == '|') -1
      else 2
    private def skipSep(): Unit =
      while (i < text.length && cls(text.charAt(i)) < 0) i += 1
    skipSep()
    def hasNext: Boolean = i < text.length
    def next(): String = {
      val k = cls(text.charAt(i))
      val start = i
      while (i < text.length && cls(text.charAt(i)) == k) i += 1
      val t = text.substring(start, i)
      skipSep()
      t
    }
  }

  /** `"abc"` → `"|a||b||c|"`. Iterates CODE POINTS, not UTF-16 units,
    * so a supplementary character (emoji) is one symbol — matching the
    * column encoder's `(?s)(.)` (Java regex `.` is one code point) and
    * the oracle's per-character split.
    */
  def wrap(word: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      sb.append('|').append(word.substring(i, i + n)).append('|')
      i += n
    }
    sb.toString
  }

  private def symbols(wrapped: String): Array[String] =
    if (wrapped.isEmpty) Array.empty // wrap("") — an empty word has no symbols
    else wrapped.substring(1, wrapped.length - 1)
      .split(java.util.regex.Pattern.quote("||"), -1)

  /** Learn `numMerges` merges from a word-frequency table: each round
    * counts adjacent symbol pairs weighted by word frequency (every
    * index position counts, matching the oracle SQL), picks the most
    * frequent pair (ties break lexicographically), and applies it
    * everywhere. Deterministic for a given vocabulary.
    */
  def trainMerges(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // An empty word has no symbols and no pairs — drop it rather than
    // let it poison the pair scan (the distributed vocabulary pass never
    // produces one, but this is a public seam).
    var words = wordFreqs.collect { case (w, f) if w.nonEmpty => (wrap(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        val syms = symbols(s)
        var k = 0
        while (k < syms.length - 1) {
          val p = (syms(k), syms(k + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          k += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (a, b) = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((a, b))
        val (pat, rep) = (s"|$a||$b|", s"|$a$b|")
        words = words.map { case (s, f) => (s.replace(pat, rep), f) }
        i += 1
      }
    }
    merges.result()
  }

  /** Natural text has a bounded vocabulary, but adversarial corpora
    * (random strings, base64 blobs) do not — the trainer keeps only the
    * most frequent pretokens so the driver transfer is bounded by
    * construction, the way real BPE trainers apply a frequency cutoff.
    * Rare tokens contribute no competitive pairs anyway.
    */
  val MaxVocab: Int = 1 << 16

  /** Distributed vocabulary pass (pretokenize + frequency groupBy —
    * ONE corpus scan, one shuffle bounded by vocabulary size, top-N cut
    * as TakeOrderedAndProject) feeding the driver-side merge loop.
    */
  def trainMergesFrom(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = MaxVocab): Seq[(String, String)] = {
    // Compiled pretokenizer ([[pretokens]] via PretokensExpr) instead
    // of regexp_extract_all: this is the one corpus-sized pass of BPE
    // training, and the regex was its cost.
    val toks = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.PretokensExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol))))
    val vocab = docs
      .select(explode(toks).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq
    trainMerges(vocab, numMerges)
  }

  /** Subword count of one string under a trained merge list — the
    * EXACT plain-Scala twin of `countSubwordsCol`: pretoken-free text
    * (empty, whitespace-only, pipe-only) counts 0 in both, matching the
    * reference's count_tokens (tokenizer.py:297-298 returns 0 for empty
    * text). The budget path's floor-at-1 lives in
    * `PostProcess.estimatorFor`, not here.
    */
  def countSubwords(text: String, merges: Seq[(String, String)]): Int = {
    val m = java.util.regex.Pattern.compile(PretokenRe).matcher(text)
    var n = 0
    while (m.find()) {
      var s = wrap(m.group())
      merges.foreach { case (a, b) => s = s.replace(s"|$a||$b|", s"|$a$b|") }
      n += (s.length - s.replace("|", "").length) / 2
    }
    n
  }

  /** Per-row subword count — the distributed counting path. Backed by
    * the codegen'd `BpeCountSubwords` expression (a tight per-row call
    * inside whole-stage codegen); rows with no pretokens count 0. The
    * higher-order-function formulation below documents the same
    * semantics as built-ins and pins the expression in BpeSpec.
    */
  def countSubwordsCol(textCol: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.BpeCountSubwords(
        org.apache.spark.sql.graft.ColumnBridge.expression(textCol), merges))

  /** The same count as pure built-in column expressions: pretokenize,
    * wrap each token's chars, fold the merge list as chained literal
    * replaces, count pipes/2, sum. The higher-order functions
    * (transform/aggregate) evaluate interpreted (CodegenFallback) —
    * kept as the ANSI-shaped parity twin the oracle SQL mirrors, and
    * as the cross-check for `countSubwordsCol`'s codegen path.
    */
  def countSubwordsHofCol(textCol: Column, merges: Seq[(String, String)]): Column = {
    val toks = regexp_extract_all(textCol, lit(PretokenRe), lit(0))
    val counted = transform(toks, { t =>
      val wrapped = regexp_replace(t, "(?s)(.)", "|$1|")
      val merged = merges.foldLeft(wrapped) { case (c, (a, b)) =>
        replace(c, lit(s"|$a||$b|"), lit(s"|$a$b|"))
      }
      ((length(merged) - length(replace(merged, lit("|"), lit("")))) / 2).cast("long")
    })
    coalesce(aggregate(counted, lit(0L), (acc, x) => acc + x), lit(0L))
  }
}
