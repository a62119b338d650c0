package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Every declared query runs at sf0.001 and returns a sane result; the
  * DuckDB value-level check runs in the driver's gate (and locally via
  * tools/compare.py) — this spec guards execution + determinism.
  */
class OperatorSmokeSpec extends SparkSpec {

  // Queries whose legitimate result can be empty at this tiny scale.
  private val mayBeEmpty = Set("q_anti_join", "q_except_set")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, Sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle — no exemptions left") {
    // Round 5 closed the last rows-only entry: q_multimodal_decode's
    // byte-stat fallback branch is replayed in SQL (its image branch is
    // golden-tested in MultimodalSpec, since ImageIO is not SQL).
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("flagship entry returns ranked rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "entry not sorted by score desc")
  }

  test("kNN is deterministic across runs") {
    val a = SparkEntry.queries("q_knn_cosine")(spark, Sf).collect().toSeq
    val b = SparkEntry.queries("q_knn_cosine")(spark, Sf).collect().toSeq
    assert(a == b)
  }

  test("LSH dedup plan contains no cartesian product") {
    val plan = SparkEntry.queries("q_dedup_minhash_lsh")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH dedup must stay bucket-local")
  }
}
