package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable per-row worker delegating to the reference scalar
  * cascade (`graft.retrieval.QuerySanitizer.sanitize`). */
final class SanitizeWorker extends Serializable {
  def sanitize(text: String): UTF8String =
    UTF8String.fromString(graft.retrieval.QuerySanitizer.sanitize(text))
}

/** Codegen'd query sanitization (F9): one linear-time scalar-cascade
  * call per row. Replaces the twin regexp_extract formulation in the
  * named query, whose anchored patterns (`([^.!?]*\?)[^?]*$` etc.)
  * backtrack quadratically on terminator-free word soup — honest
  * timing exposed it at ~10 s for a 5 000-row projection (~2 ms/row);
  * the scalar cascade is a lookbehind split plus length checks, linear
  * per row. ContractsSpec pins the cascade row-for-row equal to the
  * regex formulation on the planted corpus, and the DuckDB oracle
  * still replays the regex form — so the semantics stay doubly pinned.
  */
case class SanitizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "sanitize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val worker = new SanitizeWorker

  override def nullSafeEval(input: Any): Any =
    worker.sanitize(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sanitizeWorker", worker,
      classOf[SanitizeWorker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sanitize($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
