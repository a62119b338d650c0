package graft.plans

import graft.functions.expressions.{AnnProbe, CosineSimF32, DotProductF32}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType}

/** Catalyst rewrite for probed-cell ANN over a sign-bucketed table
  * (SURVEY §4's deferred rule): a projection computing
  * `ann_probe(cosine(embedding, <query literal>))` above a relation
  * with a `bucket` column gains `bucket = signBucket(query)` directly
  * over the scan. On a layout written `partitionBy("bucket")` the
  * equality becomes a PartitionFilter — the scan reads ONE cell
  * directory, which is what turns `ORDER BY sim DESC LIMIT k` from a
  * full-corpus scan into a cell probe at 100 TB.
  *
  * Safety properties:
  *  - fires only on the explicit `ann_probe` marker (never infers
  *    approximate semantics from an exact top-k plan);
  *  - the bucket computed from the query literal uses bit i = sign of
  *    element i — the SAME convention as `VectorFunctions.signBucket`,
  *    pinned by AnnProbeRuleSpec against the column implementation;
  *  - anything unexpected (non-literal query, no bucket column, an
  *    unrecognized bucket type) degrades to stripping the marker — the
  *    plan stays a correct full scan, never a wrong probe;
  *  - converges under the fixed-point user-rule batch because the
  *    marker is always removed.
  *
  * Install on an existing session with `AnnBucketProbe.install` (the
  * `spark.experimental.extraOptimizations` seam) or session-wide via
  * `GraftExtensions`.
  */
object AnnBucketProbe extends Rule[LogicalPlan] {

  /** The query vector's sign-bucket: bit i-1 set iff element i ≥ 0 —
    * `VectorFunctions.signBucket` in driver form.
    */
  private def bucketOf(vec: ArrayData, bits: Int): Long = {
    var b = 0L
    var i = 0
    while (i < bits && i < vec.numElements()) {
      if (vec.getFloat(i) >= 0f) b |= 1L << i
      i += 1
    }
    b
  }

  private def markersIn(e: Expression): Seq[(ArrayData, Int)] =
    e.collect {
      case AnnProbe(CosineSimF32(_, Literal(v: ArrayData, ArrayType(FloatType, _))), bits) => (v, bits)
      case AnnProbe(DotProductF32(_, Literal(v: ArrayData, ArrayType(FloatType, _))), bits) => (v, bits)
    }

  /** EVERY marker, recognizable or not — a marker whose query vector is
    * not a float-array literal (a column, a cast, a reversed argument
    * order) cannot name a cell, and must therefore veto narrowing
    * rather than be invisible to the same-cell guard.
    */
  private def markerCount(e: Expression): Int =
    e.collect { case m: AnnProbe => m }.size

  private def strip(ne: NamedExpression): NamedExpression =
    ne.transform { case AnnProbe(c, _) => c }.asInstanceOf[NamedExpression]

  private def cellFilter(b: Attribute, cell: Long): Option[Expression] =
    b.dataType match {
      case LongType => Some(And(IsNotNull(b), EqualTo(b, Literal(cell))))
      case IntegerType => Some(And(IsNotNull(b), EqualTo(b, Literal(cell.toInt))))
      case _ => None // unrecognized bucket representation: full scan
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, child) if projList.exists(markerCount(_) > 0) =>
      val stripped = projList.map(strip)
      // Every marker in the projection must name the SAME cell —
      // narrowing two different query vectors to the first one's bucket
      // would silently skew the second similarity's candidate set. A
      // disagreeing marker set, or ANY marker the literal patterns
      // cannot resolve to a cell (recognized < total), degrades to the
      // full scan, like every other unexpected shape here.
      val recognized = projList.flatMap(markersIn(_))
      val total = projList.map(markerCount).sum
      val cells = recognized.map { case (v, b) => bucketOf(v, b) }.distinct
      val narrowed = (for {
        cell <- if (recognized.size == total && cells.size == 1) cells.headOption else None
        bucketAttr <- child.output.find(_.name == "bucket")
        cond <- cellFilter(bucketAttr, cell)
      } yield Filter(cond, child)).getOrElse(child)
      Project(stripped, narrowed)
  }

  /** Idempotently add this rule to an existing session's optimizer. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
