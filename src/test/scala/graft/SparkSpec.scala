package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  val Sf = "/root/testdata/sf0.001"
}

object SparkSpec {
  // One session for the whole test JVM (sbt forks a single JVM for tests).
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // Generated-code compile failures must FAIL tests, not silently
      // de-codegen the stage: Janino errors (e.g. two fused kernels
      // redeclaring a local) otherwise downgrade to interpreted
      // execution with only a log line. CodegenFallback *expressions*
      // (the HOF formulations) are unaffected — this flag governs
      // compile errors only.
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
