package graft

import graft.functions.expressions.{CosineSimF32, DotProductF32}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * codegen expressions as SQL functions so `spark.sql` users get them
  * too (`SELECT cosine_f32(a, b)`, `dot_f32(a, b)`), and the
  * probed-cell ANN optimizer rule (`graft.plans.AnnBucketProbe`).
  *
  * Wire with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSimF32].getName, "cosine_f32"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_f32 takes exactly 2 arguments")
        CosineSimF32(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_f32 takes exactly 2 arguments")
        DotProductF32(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => graft.plans.AnnBucketProbe)
  }
}
