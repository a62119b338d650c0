package graft.streaming

import org.apache.spark.sql.{SparkSession, functions => F}

/** Measured evidence for the two curation surfaces that have no named
  * oracle query: the self-growing streaming-dedup micro-batch and the
  * manifest export writer. Prints one JSON line.
  *
  * The streaming measurement answers the scale question the design doc
  * raises: a micro-batch probe is a streamed hash join against the
  * accumulated index, so per-batch cost grows with index SIZE (scan
  * I/O), not with index×batch — this main pins the curve so the claim
  * is measured, not asserted. Batch = 10% of the corpus docs; index =
  * the other 90%, built through the same processBatch code path.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.streaming.CurationBench
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val work = java.nio.file.Files.createTempDirectory("curation_bench").toString

    val docs = graft.io.Tables.documents(spark, sfDir)
      .select(F.col("doc_id"), F.col("text"),
        F.lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
    val indexDocs = docs.filter(F.col("doc_id") % 10 =!= 0)
    val batchDocs = docs.filter(F.col("doc_id") % 10 === 0)
    val buildSec = timed {
      StreamingDedup.processBatch(indexDocs, 0L, s"$work/index", s"$work/novel")
    }
    val indexRows = spark.read.parquet(s"$work/index").count()
    val batchSec = timed {
      StreamingDedup.processBatch(batchDocs, 1L, s"$work/index", s"$work/novel")
    }
    val batchCount = batchDocs.count()

    val exportSec = timed {
      graft.operators.Curation.exportManifest(spark, sfDir, s"$work/corpus"): Unit
    }

    println(s"""{"sf":"$sfDir","index_rows":$indexRows,"batch_docs":$batchCount,""" +
      s""""index_build_sec":$buildSec,"stream_batch_sec":$batchSec,"export_sec":$exportSec}""")
    spark.stop()
  }
}
