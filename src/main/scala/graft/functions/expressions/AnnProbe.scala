package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Marker expression for probed-cell ANN (SURVEY §4's deferred Catalyst
  * piece): wraps a similarity expression to declare "this ranking may be
  * restricted to the query vector's sign-bucket cell". The marker itself
  * is a pure passthrough — with no optimizer involvement the plan still
  * runs (exact semantics, full scan). `graft.plans.AnnBucketProbe`
  * consumes it: when the marked similarity compares against a foldable
  * query vector AND the scanned relation carries a `bucket` column, the
  * rule strips the marker and injects `bucket = <query's bucket>`, which
  * a bucket-PARTITIONED layout turns into partition pruning (the scan
  * reads one cell directory, not the corpus — the plan-level form of the
  * reference's FAISS cell probe, alma/storage/sqlite_local.py:469-601).
  *
  * The opt-in marker is the design point: an ANN probe is approximate,
  * so the narrowing must be asked for per-expression, never inferred
  * from an `ORDER BY sim` that expects exact top-k.
  */
case class AnnProbe(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ann_probe"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
