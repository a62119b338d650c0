package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (the lakehouse OPTIMIZE ZORDER
  * analog): bit-interleave two range-bucketed dimensions into a
  * Z-value, lay the data out in contiguous Z-ranges ("files"), and
  * prune multi-dimensional range predicates against per-file min/max
  * stats.
  *
  * Why it matters at 100 TB: a single-dim sort gives perfect pruning
  * on ONE column and none on the second — a 2-D box predicate touches
  * every file of the selected first-dim stripe. The Z-curve's quadtree
  * property (an aligned 2^k × 2^k cell square maps to ONE contiguous
  * Z-range) keeps a box predicate inside a handful of Z-ranges, so
  * BOTH columns prune. `q_zorder_layout` computes that comparison
  * inside the engine: the same box predicate against the same 32-file
  * budget, counted under each layout.
  *
  * The query is the PLANNING arithmetic a reader does against file
  * stats; [[zorderWrite]] is the writer that makes it physical
  * (repartitionByRange over z + sortWithinPartitions, so every file
  * owns one contiguous, disjoint z-range — `LayoutSpec` asserts the
  * ranges and the box's file-touch count on real written files).
  */
object Layout {

  /** Bits per dimension; 2·[[ZBits]] total z bits. 32×32 grid cells —
    * per-file stats get FINER with more bits, but 5 is enough for the
    * 32-file budget the query models.
    */
  private val ZBits = 5
  private val ZCells = 1L << ZBits // 32 cells per dim
  private val ZFiles = 32L         // contiguous-z-range "files"

  /** Interleaved Morton code of two already-bucketed cell coordinates
    * (x bits at even positions, y at odd). Pure integer arithmetic —
    * codegen'd, no UDF.
    */
  def zvalue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** The same Morton code as oracle SQL over cell columns `x`, `y`. */
  private def zvalueSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Range-bucket a key into [0, ZCells) given its 1-row max frame —
    * the width-bucketing a writer derives from column stats.
    */
  private def cell(key: Column, maxKey: Column): Column =
    floor(key * lit(ZCells) / (maxKey + lit(1L))).cast("long")

  // The 2-D box predicate under audit: the aligned quarter-range
  // square [8,15]² (aligned 8×8 cell square = exactly one contiguous
  // 64-value z-range by the quadtree property — the best case the
  // curve is DESIGNED to hit; LayoutSpec also audits an unaligned box,
  // which fragments into more ranges but stays far under the stripe
  // cost of a single-dim sort).
  private val BoxLo = 8L
  private val BoxHi = 15L

  /** Files touched by the box under (a) the z-order layout and (b) a
    * single-dim sort on x, from the same 32-file budget. File id =
    * contiguous value-range bucket in layout order; a file is touched
    * when any box row lands in it — exactly the min/max-stat pruning
    * decision, computed from the data instead of parquet footers.
    */
  private def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val maxes = li.agg(max("l_partkey").as("maxp"), max("l_suppkey").as("maxs"))
    val cells = li.crossJoin(broadcast(maxes))
      .select(
        cell(col("l_partkey"), col("maxp")).as("x"),
        cell(col("l_suppkey"), col("maxs")).as("y"))
      .select(col("x"), col("y"), zvalue(col("x"), col("y")).as("z"))
      // z-order file: 32 consecutive z values per file. x-sort file:
      // the x cell itself (32 y-cells stripe per x value).
      .select(col("x"), col("y"),
        floor(col("z") / lit((ZCells * ZCells) / ZFiles)).as("zfile"),
        col("x").as("xfile"))
    val inBox = col("x").between(BoxLo, BoxHi) && col("y").between(BoxLo, BoxHi)
    // ONE corpus pass: a map-side-combined aggregate collapses the scan
    // to the ≤ 2^(2·ZBits) occupied grid cells, so every distinct-count
    // (whose multi-distinct plan expands its input 5×) runs over the
    // bounded grid, never the corpus; the stack() reshapes the single
    // row into the two-layout form.
    val grid = cells.groupBy("x", "y", "zfile", "xfile")
      .agg(count(lit(1)).as("n"))
    grid.agg(
      countDistinct(col("xfile")).as("x_total"),
      countDistinct(when(inBox, col("xfile"))).as("x_touched"),
      countDistinct(col("zfile")).as("z_total"),
      countDistinct(when(inBox, col("zfile"))).as("z_touched"),
      sum(when(inBox, col("n")).otherwise(0L)).as("rows_in_box"))
      .selectExpr(
        """stack(2,
          |  'xsort',  x_total, x_touched, rows_in_box,
          |  'zorder', z_total, z_touched, rows_in_box
          |) AS (layout, files_total, files_touched, rows_in_box)""".stripMargin)
      .orderBy("layout")
  }

  private val zorderLayoutSql = {
    val z = zvalueSql("x", "y")
    s"""WITH m AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem),
       |cells AS (
       |  SELECT CAST(floor(l_partkey * $ZCells / (maxp + 1)) AS BIGINT) AS x,
       |         CAST(floor(l_suppkey * $ZCells / (maxs + 1)) AS BIGINT) AS y
       |  FROM lineitem CROSS JOIN m),
       |f AS (
       |  SELECT x, y, CAST(floor(($z) / ${(ZCells * ZCells) / ZFiles}) AS BIGINT) AS zfile,
       |         x AS xfile
       |  FROM cells),
       |b AS (SELECT *, (x BETWEEN $BoxLo AND $BoxHi AND y BETWEEN $BoxLo AND $BoxHi) AS inbox FROM f)
       |SELECT layout, files_total, files_touched, rows_in_box FROM (
       |  SELECT 'xsort' AS layout,
       |    count(DISTINCT xfile)::BIGINT AS files_total,
       |    count(DISTINCT CASE WHEN inbox THEN xfile END)::BIGINT AS files_touched,
       |    coalesce(sum(CASE WHEN inbox THEN 1 ELSE 0 END), 0)::BIGINT AS rows_in_box
       |  FROM b
       |  UNION ALL
       |  SELECT 'zorder',
       |    count(DISTINCT zfile)::BIGINT,
       |    count(DISTINCT CASE WHEN inbox THEN zfile END)::BIGINT,
       |    coalesce(sum(CASE WHEN inbox THEN 1 ELSE 0 END), 0)::BIGINT
       |  FROM b)
       |ORDER BY layout""".stripMargin
  }

  /** Physically lay a frame out in z-order: range-partition on the
    * Morton code of the two bucketed dimensions and sort inside each
    * partition, so every written file owns one contiguous z-range,
    * disjoint from every other file's — which is precisely what makes
    * min/max footer stats prunable for 2-D predicates. Returns the
    * written path's row count.
    */
  def zorderWrite(df: DataFrame, xKey: String, yKey: String, path: String,
      files: Int = ZFiles.toInt): Long = {
    val maxes = df.agg(max(xKey).as("maxp"), max(yKey).as("maxs"))
    val z = df.crossJoin(broadcast(maxes))
      .withColumn("x", cell(col(xKey), col("maxp")))
      .withColumn("y", cell(col(yKey), col("maxs")))
      .withColumn("z", zvalue(col("x"), col("y")))
      .drop("maxp", "maxs")
    z.repartitionByRange(files, col("z"))
      .sortWithinPartitions("z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    df.sparkSession.read.parquet(path).count()
  }

  val all: Seq[Q] = Seq(
    Q("q_zorder_layout", zorderLayout, Some(zorderLayoutSql)))
}
