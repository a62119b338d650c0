package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Z-order layout: the planning query's pruning claim, and the physical
  * writer's file-range contract on real written parquet.
  */
class LayoutSpec extends SparkSpec {

  test("z-order beats the single-dim sort on the 2-D box predicate") {
    val out = SparkEntry.queries("q_zorder_layout")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (xTotal, xTouched, xRows) = out("xsort")
    val (zTotal, zTouched, zRows) = out("zorder")
    assert(xRows == zRows, "both layouts audit the same box rows")
    assert(xRows > 0, "box predicate must select something")
    assert(zTotal == xTotal, "same file budget under both layouts")
    // The aligned quarter-range box: one contiguous 64-value z-range =
    // 2 files of 32 z-values; the x stripe costs its full 8 files.
    assert(zTouched < xTouched,
      s"z-order must touch fewer files than the x sort: $zTouched vs $xTouched")
    assert(zTouched <= 2, s"aligned box should stay within 2 z-files, got $zTouched")
  }

  test("an unaligned box still prunes far better than the x stripe") {
    // Unaligned boxes fragment into multiple z-ranges (no quadtree
    // alignment) — the honest case. Recompute both layouts' touch
    // counts for [5,12]² directly from the cell grid.
    val li = graft.io.Tables.lineitem(spark, Sf)
    val maxes = li.agg(max("l_partkey").as("maxp"), max("l_suppkey").as("maxs"))
    val cells = li.crossJoin(broadcast(maxes))
      .select(
        floor(col("l_partkey") * 32 / (col("maxp") + 1)).cast("long").as("x"),
        floor(col("l_suppkey") * 32 / (col("maxs") + 1)).cast("long").as("y"))
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y")).as("z"))
    val inBox = col("x").between(5, 12) && col("y").between(5, 12)
    val zTouched = cells.filter(inBox)
      .select(floor(col("z") / 32).as("f")).distinct().count()
    val xTouched = cells.filter(inBox).select("x").distinct().count()
    assert(zTouched < xTouched,
      s"unaligned box: z-order $zTouched files vs x-sort $xTouched")
  }

  test("zorderWrite lays files out in disjoint contiguous z-ranges that localize the box") {
    val path = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      val li = graft.io.Tables.lineitem(spark, Sf)
      val n = Layout.zorderWrite(li, "l_partkey", "l_suppkey", path, files = 8)
      assert(n == li.count(), "write must preserve every row")
      val back = spark.read.parquet(path)
        .select(col("z"), input_file_name().as("file"))
      // Every file owns one z-range, disjoint from every other file's —
      // the property parquet min/max footer pruning needs.
      val ranges = back.groupBy("file")
        .agg(min("z").as("lo"), max("z").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.nonEmpty)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"overlapping file z-ranges: $ranges")
        case _ =>
      }
      // The aligned box is one contiguous z-range [z(8,8), z(8,8)+63]:
      // with 8 files over the written corpus it must land in at most 2.
      val boxFiles = spark.read.parquet(path)
        .filter(col("x").between(8, 15) && col("y").between(8, 15))
        .select(input_file_name()).distinct().count()
      assert(boxFiles <= 2, s"box rows spread over $boxFiles files")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }
}
