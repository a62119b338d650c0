package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled centroid-assignment kernels for the Lloyd / product-
  * quantization family (q_kmeans_train, q_ann_ivf_kmeans, q_ann_pq,
  * q_ann_ivfpq — reference behavior: FAISS-style coarse quantize +
  * PQ encode; see Pq.scala / ScalePatterns.scala for the operator
  * contracts).
  *
  * Why: the declarative assignment shapes — a (corpus × k) candidate
  * frame through a map-side-combined `min(struct(dist2, cid, …))`, or
  * a per-subspace join against a broadcast codebook — are exchange-
  * bounded but pay an interpreted `aggregate(zip_with(pow(…)))` tree
  * per (row, centroid): with k centroids that is ~4·dim interpreted
  * expression nodes × k per row, which dominated the ANN family's
  * decade profile exactly the way the pre-kernel IVF probe did before
  * [[TopCellsF32]]. Each kernel here does the whole argmin in ONE
  * primitive loop per row, so assignment/encode become shuffle-free
  * projections: no candidate row ever exists, the only exchanges left
  * in training are the bounded (≤ k·dim rows) mean updates.
  *
  * Parity contract (what the DuckDB oracles and the declarative twins
  * pin): distances accumulate in double in element order as
  * `Math.pow(x_i − c_i, 2)` (bit-identical to the
  * `zip_with(a, b, (x, y) => pow(x.cast(double) − y, 2))` fold they
  * replace), are rounded HALF_UP at 6 decimals via
  * `BigDecimal.valueOf` (bit-identical to Spark's `round(_, 6)`), and
  * ties break on the smaller centroid id — the same total order as
  * `min(struct(dist2, cid))` / `row_number() OVER (ORDER BY dist2,
  * cid)`.
  *
  * Codebooks ride as Broadcast handles (the [[TopCellsF32]] pattern):
  * bounded driver-side arrays, shipped once per executor, and two
  * kernel nodes over the same handle canonicalize by case-class
  * equality so subexpression elimination works.
  */
object CentroidKernels {

  /** Read element `i` of a float- or double-typed ArrayData as double. */
  private[expressions] def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private[expressions] def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[expressions] def vecTypeOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** HALF_UP rounding at 6 decimals, bit-identical to Spark's
    * `round(_, 6)` — public so driver-side LUT construction (Pq) uses
    * the exact same rounding as the kernels.
    */
  def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** Squared L2 distance between two float/double vectors, accumulated
  * in double in element order as `Math.pow(x − y, 2)` — the codegen'd
  * twin of the `aggregate(zip_with(..., pow(x.cast(double) − y, 2)))`
  * HOF fold (kept as the parity reference in ScalePatterns/Pq specs).
  * Length mismatch yields NULL, mirroring zip_with's null-pad
  * propagation.
  */
case class SqDistVec(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.vecTypeOk(left.dataType) && CentroidKernels.vecTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def lf = CentroidKernels.isFloatArray(left.dataType)
  private def rf = CentroidKernels.isFloatArray(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = CentroidKernels.elem(x, i, lf) - CentroidKernels.elem(y, i, rf)
      s += java.lang.Math.pow(d, 2.0)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val getL = if (lf) "getFloat" else "getDouble"
      val getR = if (rf) "getFloat" else "getDouble"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ((double) $a.$getL($i)) - ((double) $b.$getR($i));
         |    $s += java.lang.Math.pow($d, 2.0);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest centroid of a vector against a driver-materialized codebook
  * by (squared L2 rounded to 6 decimals ASC, centroid id ASC) — the
  * Lloyd assign step as one primitive loop per row. Output is
  * `struct(cid, dist2)` with dist2 the ROUNDED winning distance, so
  * the inertia audit reads the same values the declarative
  * `min(struct(round(dist2, 6), cid, …))` argmin produced.
  *
  * Two DELIBERATE divergences from the declarative twin, both
  * unreachable with codebooks/vectors built by the training paths and
  * pinned in `CentroidKernelSpec`: (1) a dimension-corrupt centroid
  * ranks LAST (+∞) — under `min(struct(…))` the null dist2 the HOF
  * produces sorts FIRST, so the declarative argmin would hand every
  * row to the corrupt entry, which is the wrong answer to preserve
  * (an ALL-corrupt codebook degrades to the smallest cid with the
  * impossible +∞ distance visible in the output — never a throw,
  * never a plausible-looking answer); (2) a NaN-poisoned input vector
  * fails every comparison including the ∞-tie, so the kernel returns
  * the untouched sentinel `(Long.MaxValue, +∞)`, where the declarative
  * form (Spark orders NaN largest) would return an arbitrary real
  * centroid for a garbage vector.
  */
case class NearestCellSq(
    child: Expression,
    codebook: Broadcast[(Array[Long], Array[Array[Double]])])
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val cellIds: Array[Long] = codebook.value._1
  @transient private lazy val cells: Array[Array[Double]] = codebook.value._2

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("dist2", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")

  private def cf = CentroidKernels.isFloatArray(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = CentroidKernels.elem(a, i, cf); i += 1 }
    val k = cells.length
    var bestCid = Long.MaxValue
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val cv = cells(c)
      val d =
        if (cv.length != n) Double.PositiveInfinity
        else {
          var s = 0.0
          var j = 0
          while (j < n) {
            val dj = x(j) - cv(j)
            s += java.lang.Math.pow(dj, 2.0)
            j += 1
          }
          CentroidKernels.round6(s)
        }
      if (d < bestD || (d == bestD && cellIds(c) < bestCid)) {
        bestD = d
        bestCid = cellIds(c)
      }
      c += 1
    }
    InternalRow(bestCid, bestD)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest centroid by (cosine rounded to 4 decimals DESC, centroid id
  * ASC) — [[TopCellsF32]]'s ranking, but returning `struct(cl, csim)`
  * so SemDeDup's assign step keeps the winning similarity without a
  * second pass. Same parity contract as TopCellsF32: double
  * accumulation in element order, zero-norm ⇒ 0.0 (never NaN), HALF_UP
  * rounding at 4 decimals — bit-identical to `round(cosineHof(…), 4)`
  * through the `max(struct(csim, -cl, …))` argmax it replaces.
  *
  * Corrupt/NaN edge contract (pinned in `CentroidKernelSpec`): a
  * dimension-corrupt centroid ranks LAST (−∞) — here the descending
  * argmax happens to AGREE with the declarative twin, whose null csim
  * sorts smallest under `max(struct(…))` — while a NaN-poisoned input
  * vector fails every comparison and returns the no-winner sentinel
  * `(Long.MaxValue, −∞)`, where the declarative form (Spark orders NaN
  * largest) would hand the garbage row to a real centroid. Both shapes
  * are unreachable with trained codebooks and normalized inputs.
  */
case class NearestCellCos(
    child: Expression,
    codebook: Broadcast[(Array[Long], Array[Array[Double]])])
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val cellIds: Array[Long] = codebook.value._1
  @transient private lazy val cells: Array[Array[Double]] = codebook.value._2
  @transient private lazy val cellNorms: Array[Double] = cells.map { cv =>
    var s = 0.0
    var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cl", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")

  private def cf = CentroidKernels.isFloatArray(child.dataType)

  private def round4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var sx = 0.0
    var i = 0
    while (i < n) {
      val v = CentroidKernels.elem(a, i, cf)
      x(i) = v
      sx += v * v
      i += 1
    }
    val na = math.sqrt(sx)
    val k = cells.length
    var bestCl = Long.MaxValue
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val cv = cells(c)
      val sim =
        if (cv.length != n) Double.NegativeInfinity
        else {
          var dot = 0.0
          var j = 0
          while (j < n) { dot += x(j) * cv(j); j += 1 }
          val denom = na * cellNorms(c)
          round4(if (denom == 0.0) 0.0 else dot / denom)
        }
      if (sim > bestSim || (sim == bestSim && cellIds(c) < bestCl)) {
        bestSim = sim
        bestCl = cellIds(c)
      }
      c += 1
    }
    InternalRow(bestCl, bestSim)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodebook {
  /** Subspace stride for packing (sub, cid) into one long codebook key:
    * `key = sub * Stride + cid`. Centroid ids are seed vec_ids — far
    * below the stride by construction.
    */
  val Stride: Long = 1L << 32
}

/** Product-quantization assign/encode: for each of the m contiguous
  * `dsub`-wide subvectors, the nearest subspace centroid's id by
  * (squared L2 rounded to 6 ASC, cid ASC) — the whole m-way encode as
  * ONE call per row, output `array<long>` of m raw centroid ids. The
  * codebook's parallel arrays are keyed `sub * PqCodebook.Stride + cid`
  * and MUST be sorted by that key (per-sub ranges are scanned
  * contiguously). A vector whose length isn't m·dsub yields NULL — the
  * declarative slice form would silently score garbage.
  */
case class PqAssignCodes(
    child: Expression,
    codebook: Broadcast[(Array[Long], Array[Array[Double]])])
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val keys: Array[Long] = codebook.value._1
  @transient private lazy val cells: Array[Array[Double]] = codebook.value._2
  @transient private lazy val dsub: Int = cells(0).length
  @transient private lazy val m: Int =
    (keys(keys.length - 1) / PqCodebook.Stride).toInt + 1
  // subStart(s) .. subStart(s+1) is subspace s's contiguous key range
  @transient private lazy val subStart: Array[Int] = {
    val st = new Array[Int](m + 1)
    var s = 1
    var i = 0
    while (s <= m) {
      while (i < keys.length && keys(i) / PqCodebook.Stride < s) i += 1
      st(s) = i
      s += 1
    }
    st
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")

  private def cf = CentroidKernels.isFloatArray(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != m * dsub) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = CentroidKernels.elem(a, i, cf); i += 1 }
    val out = new Array[Long](m)
    var sub = 0
    while (sub < m) {
      val off = sub * dsub
      var bestCid = Long.MaxValue
      var bestD = Double.PositiveInfinity
      var e = subStart(sub)
      val end = subStart(sub + 1)
      while (e < end) {
        val cv = cells(e)
        var s = 0.0
        var j = 0
        while (j < dsub) {
          val dj = x(off + j) - cv(j)
          s += java.lang.Math.pow(dj, 2.0)
          j += 1
        }
        val d = CentroidKernels.round6(s)
        val cid = keys(e) - sub * PqCodebook.Stride
        if (d < bestD || (d == bestD && cid < bestCid)) {
          bestD = d
          bestCid = cid
        }
        e += 1
      }
      out(sub) = bestCid
      sub += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance lookup: `round6(Σ_sub lut[sub][codes[sub]])`
  * over a PQ code array and a driver-computed `[sub][cid]` table of
  * per-subspace `round6` query-to-centroid contributions — the ADC
  * scan as one projection, replacing the (codes ⋈ broadcast lut) →
  * groupBy-sum shape whose exchange carried m rows per vector. A code
  * outside the table yields NULL (never produced by
  * [[PqAssignCodes]]).
  */
case class PqAdcDist(
    child: Expression,
    lut: Broadcast[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val table: Array[Array[Double]] = lut.value

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> codes, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != table.length) return null
    var s = 0.0
    var sub = 0
    while (sub < m) {
      val cid = codes.getLong(sub)
      val row = table(sub)
      if (cid < 0 || cid >= row.length) return null
      s += row(cid.toInt)
      sub += 1
    }
    CentroidKernels.round6(s)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `vec − centroid(cid)` in double — the IVF-PQ residual as one call
  * per row against a driver-materialized codebook, replacing the
  * (asg ⋈ broadcast centroids) + interpreted `zip_with(x − c)` shape.
  * Ids resolve through a hash map; an unknown cid or a dimension
  * mismatch yields NULL (the join form would have dropped the row —
  * NULL surfaces the corruption instead of silently shrinking the
  * corpus).
  */
case class CentroidResidualVec(
    left: Expression,
    right: Expression,
    codebook: Broadcast[(Array[Long], Array[Array[Double]])])
  extends BinaryExpression with CodegenFallback {

  @transient private lazy val byId: java.util.HashMap[Long, Array[Double]] = {
    val (ids, cells) = codebook.value
    val m = new java.util.HashMap[Long, Array[Double]](ids.length * 2)
    var i = 0
    while (i < ids.length) { m.put(ids(i), cells(i)); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.vecTypeOk(left.dataType) && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, bigint), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def lf = CentroidKernels.isFloatArray(left.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cv = byId.get(b.asInstanceOf[Long])
    if (cv == null || cv.length != x.numElements()) return null
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = CentroidKernels.elem(x, i, lf) - cv(i); i += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
