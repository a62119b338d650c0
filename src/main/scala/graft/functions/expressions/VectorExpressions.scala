package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-vector similarity kernels — the one genuinely custom
  * Catalyst piece this engine needs (SURVEY §4: "Custom Catalyst work
  * actually needed: one CosineSimilarity/DotProduct expression over
  * ArrayType(FloatType)").
  *
  * The generic higher-order-function formulation (zip_with + aggregate)
  * is CodegenFallback: every row pays lambda-interpretation overhead ×
  * vector length, which dominates kNN and similarity-self-join plans.
  * These expressions emit a tight primitive loop inside whole-stage
  * codegen instead. Accumulation is double, in element order — bit-
  * identical to the sequential HOF fold they replace, so oracle parity
  * is preserved.
  */
abstract class FloatVectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // Length-mismatched inputs yield NULL (the zip_with formulation
  // null-pads and propagates null) — a silently-truncated similarity
  // would let corrupt/mixed-dimension rows rank as plausible scores.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Sum of elementwise products over two float arrays, in double. */
case class DotProductF32(left: Expression, right: Expression) extends FloatVectorKernel {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  // Every generated local goes through ctx.freshName: two kernels fused
  // into ONE whole-stage-codegen region (e.g. a projection computing a
  // dot and a cosine, or two cosines against different query vectors)
  // would otherwise both declare `int i` in the same Java scope, Janino
  // throws "Redefinition of local variable", and Spark silently falls
  // back to interpreted execution for the whole stage — defeating the
  // kernel exactly in the multi-similarity plans it exists for.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity over two float arrays: dot / (||a|| * ||b||), all
  * accumulated in double in element order. A zero-norm side yields 0.0,
  * NOT NaN: Spark orders NaN ABOVE every double, so a 0/0 here would
  * make one all-zero embedding (empty text through a hash/model
  * encoder) outrank every genuine match in every descending
  * similarity sort.
  */
case class CosineSimF32(left: Expression, right: Expression) extends FloatVectorKernel {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  // ctx.freshName on every local — see DotProductF32.doGenCode for why
  // (fused multi-kernel stages must not redeclare the same Java locals).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $nx += $xi * $xi;
         |    $ny += $yi * $yi;
         |  }
         |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  ${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
