package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row worker behind [[BpeCountSubwords]]: one compiled pretokenizer
  * and the merge list as parallel pattern/replacement arrays, built once
  * per executor (the expression ships it as a reference object). The
  * algorithm is graft.functions.Bpe.countSubwords verbatim — BpeSpec
  * pins all three implementations (scalar, this, the HOF oracle twin)
  * to identical counts on the real corpus.
  */
final class BpeCounter(merges: Seq[(String, String)]) extends Serializable {
  private val pats: Array[String] = merges.map { case (a, b) => s"|$a||$b|" }.toArray
  private val reps: Array[String] = merges.map { case (a, b) => s"|$a$b|" }.toArray

  def count(text: String): Long = {
    // Linear-scan pretokenizer (Bpe.pretokens) — the regex matcher this
    // replaced was the per-row cost at scale; the scalar twin
    // (Bpe.countSubwords) keeps the regex as parity ground truth.
    val it = graft.functions.Bpe.pretokens(text)
    var n = 0L
    while (it.hasNext) {
      var s = graft.functions.Bpe.wrap(it.next())
      var i = 0
      while (i < pats.length) { s = s.replace(pats(i), reps(i)); i += 1 }
      n += (s.length - s.replace("|", "").length) / 2
    }
    n
  }
}

/** Compiled pretokenizer array — `regexp_extract_all(text, PretokenRe)`
  * as one linear scan ([[graft.functions.Bpe.pretokens]]): feeds BPE
  * training's vocabulary pass, the one corpus-sized stage of the
  * trainer. Values are the exact regex extraction (pinned by
  * `KernelProps` adversarially and by the oracle SQL, which still
  * replays the regex).
  */
case class PretokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pretokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val worker = new PretokensWorker

  override def nullSafeEval(input: Any): Any =
    worker.pretokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pretokensWorker", worker, classOf[PretokensWorker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pretokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final class PretokensWorker extends Serializable {
  def pretokens(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val it = graft.functions.Bpe.pretokens(u.toString)
    while (it.hasNext) out += UTF8String.fromString(it.next())
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }
}

/** Codegen'd BPE subword count (A12): the distributed counting half of
  * the tokenizer-primary budget. The higher-order-function formulation
  * (`Bpe.countSubwordsHofCol`) pays Catalyst lambda interpretation per
  * pretoken per merge — at 100 TB the per-row counting IS the job, so
  * this expression stays inside whole-stage codegen and calls one tight
  * reference-object method per row instead.
  */
case class BpeCountSubwords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count_subwords"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val counter = new BpeCounter(merges)

  override def nullSafeEval(input: Any): Any =
    counter.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCounter", counter, classOf[BpeCounter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row worker behind [[BpeTokenClassCounts]]: ONE linear scan
  * replicating `regexp_extract_all(raw, BpeRe)` (the lookahead-free
  * GPT-2-ish pretokenizer: ` ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +`, with
  * the alternation's ordered-first-match semantics) plus the three
  * per-class `rlike` filters — a token's class is its first
  * post-optional-space character, so classification is a range check,
  * not a regex. Returns [n_bpe, n_word, n_num, n_other]; surrogate
  * pairs behave like the regex (both halves are non-space non-[a-z0-9],
  * so they extend the same "other" run the code-point class would).
  * `TextAnalysisProps` pins this against the regex formulation.
  */
final class BpeClassCounter extends Serializable {
  def counts(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
    val len = s.length
    var nAll = 0L; var nWord = 0L; var nNum = 0L; var nOther = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') {
        val hasNext = i + 1 < len
        val d = if (hasNext) s.charAt(i + 1) else ' '
        if (hasNext && d >= 'a' && d <= 'z') {
          var j = i + 1
          while (j < len && { val x = s.charAt(j); x >= 'a' && x <= 'z' }) j += 1
          nWord += 1; nAll += 1; i = j
        } else if (hasNext && d >= '0' && d <= '9') {
          var j = i + 1
          while (j < len && { val x = s.charAt(j); x >= '0' && x <= '9' }) j += 1
          nNum += 1; nAll += 1; i = j
        } else if (hasNext && d != ' ') {
          var j = i + 1
          while (j < len && { val x = s.charAt(j)
            x != ' ' && !(x >= 'a' && x <= 'z') && !(x >= '0' && x <= '9') }) j += 1
          nOther += 1; nAll += 1; i = j
        } else {
          var j = i
          while (j < len && s.charAt(j) == ' ') j += 1
          nAll += 1; i = j // a space-run token counts in n_bpe only
        }
      } else if (c >= 'a' && c <= 'z') {
        var j = i
        while (j < len && { val x = s.charAt(j); x >= 'a' && x <= 'z' }) j += 1
        nWord += 1; nAll += 1; i = j
      } else if (c >= '0' && c <= '9') {
        var j = i
        while (j < len && { val x = s.charAt(j); x >= '0' && x <= '9' }) j += 1
        nNum += 1; nAll += 1; i = j
      } else {
        var j = i
        while (j < len && { val x = s.charAt(j)
          x != ' ' && !(x >= 'a' && x <= 'z') && !(x >= '0' && x <= '9') }) j += 1
        nOther += 1; nAll += 1; i = j
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(nAll, nWord, nNum, nOther))
  }
}

/** Codegen'd pretokenizer class counts for q_bpe_tokens: the regex
  * formulation paid FOUR regex passes per document (extract_all + one
  * rlike per element for each of three classes) — measured 17.5 s
  * isolated at the ×100 decade, the suite's mid-heavy, all of it
  * per-row CPU. One tight scan per row stays inside whole-stage
  * codegen; at 100 TB the per-row pretokenization IS the job.
  */
case class BpeTokenClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_token_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val counter = new BpeClassCounter

  override def nullSafeEval(input: Any): Any =
    counter.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeClassCounter", counter, classOf[BpeClassCounter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
