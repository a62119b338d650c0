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
  @transient private lazy val pretoken =
    java.util.regex.Pattern.compile(graft.functions.Bpe.PretokenRe)

  def count(text: String): Long = {
    val m = pretoken.matcher(text)
    var n = 0L
    while (m.find()) {
      var s = graft.functions.Bpe.wrap(m.group())
      var i = 0
      while (i < pats.length) { s = s.replace(pats(i), reps(i)); i += 1 }
      n += (s.length - s.replace("|", "").length) / 2
    }
    n
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
