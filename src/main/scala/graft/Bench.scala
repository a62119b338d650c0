package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with per-query seconds.
  *
  * Determinism rules (so per-query times are comparable across rounds):
  *   - queries run in sorted name order, never Map hash order — adding a
  *     query must not reshuffle who pays cold-start costs;
  *   - every query runs twice and reports the SECOND (warm) time, so
  *     one-time table/JSON/codegen init is not attributed to whichever
  *     query happened to run first;
  *   - the cold pass total is still reported separately (`cold_total`)
  *     because first-touch cost is real, it just is not per-query signal.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions default to the thread count; scaling-curve runs
    // override (SPARK_GRAFT_SHUFFLE) the way a cluster job would size
    // partitions with the data rather than pinning them at 1× scale.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // Warm up the JVM/codegen/parquet-reader paths once so the first
      // measured query doesn't absorb session startup.
      s.range(1000000).selectExpr("sum(id)").collect()
      s.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
      s
    }
    var spark = newSession()

    // Execute the query's OWN physical plan and count its InternalRows.
    // A DataFrame .count() would instead optimize a count-rewritten
    // plan, and Catalyst rightly prunes everything cardinality-neutral
    // out of it — unreferenced aggregate expressions, left joins that
    // can't change row counts, whole column pipelines. For queries
    // whose cost lives in exactly those columns (q_span_scrub's scrub
    // machinery collapses to a bare token count under count()), that
    // measures a different, cheaper query. toRdd runs the plan as the
    // query ships it: every output column materialized.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: " + e.getMessage)
        // If the failure took the SparkContext down with it (an OOM on
        // an oversized run did exactly this once: every later query
        // "failed" in milliseconds against a dead context), rebuild the
        // session so one query's crash can't poison the rest of the
        // sweep's measurements.
        if (spark.sparkContext.isStopped) {
          System.err.println(s"[bench] SparkContext died during $name - restarting session")
          SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
          spark = newSession()
        }
        // A failed query reports -1.0 so it cannot hide inside a
        // healthy-looking total.
        -1.0
      }
    }

    // SPARK_GRAFT_QUERIES=a,b,c restricts the run (scaling-curve
    // measurements of one operator family); default is every query.
    val filter = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.contains(n)) }
    val cold = ordered.map { case (name, fn) => name -> runOnce(name, fn) }
    val warm = ordered.map { case (name, fn) => name -> runOnce(name, fn) }

    val qs = warm.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val warmTotal = warm.map(_._2).filter(_ >= 0).sum
    val coldTotal = cold.map(_._2).filter(_ >= 0).sum
    val failed = warm.count(_._2 < 0)
    val json = s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // The stdout line gets tail-truncated by log capture once the
    // per-query map outgrows ~2000 chars (163 queries did); persist the
    // full JSON where a whole-file read always works. Override the
    // location with SPARK_GRAFT_BENCH_OUT.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/latest_bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
