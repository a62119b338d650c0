package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row worker behind [[TokenStatsExpr]]: tokenizes once and counts
  * the three per-document repetition statistics in one compiled hash
  * pass — total tokens, distinct tokens, and the highest single-token
  * occurrence count. Replaces q_repetition_filter's explode +
  * groupBy(doc_id, token) + groupBy(doc_id) chain, whose first
  * exchange carried one partial count per distinct (doc, token) of the
  * corpus and whose second re-shuffled the per-(doc, token) rows; a
  * per-document statistic should be map-side CPU (the GopherRepWorker
  * precedent), and this makes that CPU compiled and shuffle-free.
  *
  * Tokenization is `text.split(" ", -1)` — identical to Spark's
  * `split(text, " ")` including trailing empties, so every count
  * matches the explode formulation exactly (all-integer outputs; no
  * float parity risk).
  */
final class TokenStatsWorker extends Serializable {

  /** [n_tokens, n_distinct, top_n]. */
  def stats(text: String): ArrayData = {
    val toks = text.split(" ", -1)
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c.intValue()
      i += 1
    }
    new GenericArrayData(
      Array(toks.length.toLong, counts.size.toLong, top.toLong))
  }
}

/** Compiled per-document token statistics: one expression call per
  * document returns [n_tokens, n_distinct, top_n]. A pure projection —
  * the zero-shuffle scale shape for a per-doc statistic — with the
  * per-row cost of one compiled hash pass.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val worker = new TokenStatsWorker

  override def nullSafeEval(input: Any): Any =
    worker.stats(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStatsWorker", worker,
      classOf[TokenStatsWorker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
