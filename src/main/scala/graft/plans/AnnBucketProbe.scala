package graft.plans

import graft.functions.expressions.{AnnProbe, CosineSimF32, DotProductF32}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
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
  *  - a layout written via [[recordLayoutBits]] carries its bit width
  *    in a `_graft_ann_bits` sidecar; when the marker's bits disagree
  *    with the layout's declared bits the rule degrades to a full scan
  *    instead of probing a cell the layout never wrote (a 6-bit layout
  *    probed with an 8-bit marker would otherwise read a wrong — often
  *    empty — cell). A layout with no sidecar is trusted to match the
  *    marker, the pre-sidecar contract;
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

  /** Sidecar file naming the bit width a bucket-partitioned layout was
    * written with (plain decimal integer, UTF-8).
    */
  private[plans] val BitsSidecar = "_graft_ann_bits"

  /** Record the sign-bucket bit width alongside a just-written layout.
    * Call right after `df.write.partitionBy("bucket").parquet(path)`;
    * the rule refuses to narrow a probe whose marker bits disagree with
    * this declaration.
    */
  def recordLayoutBits(spark: SparkSession, layoutPath: String, bits: Int): Unit = {
    require(bits >= 1 && bits <= 63, s"bits $bits outside 1..63")
    val p = new Path(layoutPath, BitsSidecar)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(bits.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The bit width the file layout under `bucket` declares, if any: the
    * first `_graft_ann_bits` sidecar among the file relations that
    * produce the attribute. None (no file relation, or an unlabeled
    * layout) keeps the pre-sidecar trust-the-marker contract; an
    * unreadable sidecar is treated as a declaration that can never
    * match (Some(-1)) — never as license to probe.
    */
  private def declaredBits(child: LogicalPlan, bucket: Attribute): Option[Int] =
    child.collect {
      case lr: LogicalRelation if lr.output.exists(_.exprId == bucket.exprId) =>
        lr.relation match {
          case fsRel: HadoopFsRelation =>
            val conf = fsRel.sparkSession.sessionState.newHadoopConf()
            fsRel.location.rootPaths.iterator.map { root =>
              val p = new Path(root, BitsSidecar)
              val fs = p.getFileSystem(conf)
              if (!fs.exists(p)) None
              else {
                val in = fs.open(p)
                val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
                Some(txt.toIntOption.getOrElse(-1))
              }
            }.collectFirst { case Some(b) => b }
          case _ => None
        }
    }.flatten.headOption

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, child) if projList.exists(markerCount(_) > 0) =>
      val stripped = projList.map(strip)
      // Every marker in the projection must name the SAME cell with the
      // SAME bit width — narrowing two different query vectors to the
      // first one's bucket would silently skew the second similarity's
      // candidate set. A disagreeing marker set, ANY marker the literal
      // patterns cannot resolve to a cell (recognized < total), or a
      // layout whose declared bit width disagrees with the markers'
      // degrades to the full scan, like every other unexpected shape.
      val recognized = projList.flatMap(markersIn(_))
      val total = projList.map(markerCount).sum
      val cells = recognized.map { case (v, b) => bucketOf(v, b) }.distinct
      val bitses = recognized.map(_._2).distinct
      val narrowed = (for {
        cell <- if (recognized.size == total && cells.size == 1 && bitses.size == 1)
          cells.headOption else None
        bucketAttr <- child.output.find(_.name == "bucket")
        if declaredBits(child, bucketAttr).forall(_ == bitses.head)
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
