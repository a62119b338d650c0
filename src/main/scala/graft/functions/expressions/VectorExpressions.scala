package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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
  // Each side may be array<float> or array<double> (projected/centroid
  // vectors are double); accumulation is double either way, so the f32
  // parity contract is unchanged and double inputs skip the widening
  // cast the HOF forms would pay.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  protected def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
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
      dot += (if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)) *
        (if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i))
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
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
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
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
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
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.$getL($i);
         |    double $yi = (double) $b.$getR($i);
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

/** Top-`probes` coarse-quantizer cells for a float vector against a
  * driver-materialized codebook, ordered by (cosine rounded to 4
  * decimals DESC, cell id ASC) — the IVF assign/probe step as ONE
  * primitive-loop expression.
  *
  * Why not the declarative form: a (corpus × k) candidate frame pushed
  * through a window rank shuffles n·k rows, and the HOF fold
  * (`transform` over the codebook with an `aggregate`-based cosine
  * inside) re-interprets a ~4·dim-node expression tree per cell per
  * row. With a corpus-sized codebook (k = ⌈√n⌉) both collapse at scale
  * — measured on the ×30 decade: window form 38 s, HOF-fold form 50 s,
  * this kernel single-digit seconds. Here each row pays one norm + k
  * primitive dot products against cached double[][] centroids (cell
  * norms precomputed once per executor).
  *
  * Parity contract with the declarative form the oracle pins:
  * accumulation in double in element order, zero-norm ⇒ 0.0 (never
  * NaN), and HALF_UP BigDecimal rounding at 4 decimals — bit-identical
  * to `round(cosineHof(...), 4)`.
  *
  * The codebook rides as a Broadcast handle, not literal arrays: the
  * book is bounded (⌈√n⌉ rows — ~160 k × 64 doubles ≈ 80 MB at 25 B
  * vectors) but embedding it in the expression would serialize that
  * payload into EVERY task's plan; the handle ships bytes per executor
  * once via the block manager instead. The handle also restores
  * expression canonicalization: two TopCellsF32 nodes over the same
  * broadcast compare equal by case-class equality (one shared handle
  * per codebook), where raw Array fields compared by reference and
  * never matched — so subexpression elimination works again.
  */
case class TopCellsF32(
    child: Expression,
    codebook: org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Array[Double]])],
    probes: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val cellIds: Array[Long] = codebook.value._1
  @transient private lazy val cells: Array[Array[Double]] = codebook.value._2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }

  @transient private lazy val cellNorms: Array[Double] = cells.map { cv =>
    var s = 0.0
    var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var sx = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      x(i) = v
      sx += v * v
      i += 1
    }
    val na = math.sqrt(sx)
    val k = cells.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cells(c)
      if (cv.length != n) {
        // dimension-corrupt cell: rank it last (the declarative form
        // null-propagates, which a desc sort also places last)
        sims(c) = Double.NegativeInfinity
      } else {
        var dot = 0.0
        var j = 0
        while (j < n) { dot += x(j) * cv(j); j += 1 }
        val denom = na * cellNorms(c)
        sims(c) = round4(if (denom == 0.0) 0.0 else dot / denom)
      }
      c += 1
    }
    // bounded selection: p passes of argmax by (sim desc, id asc) —
    // p·k compares, no per-row sort allocation beyond the flags
    val p = math.min(probes, k)
    val out = new Array[Long](p)
    val taken = new Array[Boolean](k)
    var t = 0
    while (t < p) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && (best < 0 || sims(c2) > sims(best) ||
            (sims(c2) == sims(best) && cellIds(c2) < cellIds(best)))) {
          best = c2
        }
        c2 += 1
      }
      taken(best) = true
      out(t) = cellIds(best)
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
