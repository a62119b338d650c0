package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden-file checks (SURVEY §5): the flagship retrieval ranking and
  * the kNN ranking over the fixed sf0.001 corpus are pinned to their
  * exact (id, score) sequences. Any change to the similarity kernel,
  * scoring weights, rounding, or tiebreaks shows up here as a concrete
  * ranked diff instead of a silent drift.
  */
class GoldenSpec extends SparkSpec {

  test("flagship retrieval ranking matches the golden sequence") {
    val got = SparkEntry.queries("q_retrieval_pipeline")(spark, Sf)
      .collect().map(r => s"${r.getLong(0)}:${r.getDouble(3)}").mkString(",")
    assert(got ==
      "0:0.6768,453:0.603379,12:0.601514,380:0.595679,468:0.56237," +
        "306:0.561738,261:0.561487,232:0.559269,393:0.556822,137:0.554278")
  }

  test("kNN cosine ranking matches the golden sequence") {
    val got = SparkEntry.queries("q_knn_cosine")(spark, Sf)
      .collect().map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(",")
    assert(got ==
      "0:1.0,17:0.3345,225:0.3151,12:0.311,483:0.3005," +
        "260:0.2987,73:0.2972,212:0.2814,347:0.2745,402:0.2745")
  }
}
