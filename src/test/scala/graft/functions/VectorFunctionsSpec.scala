package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  private def one(colExpr: org.apache.spark.sql.Column, a: Array[Float], b: Array[Float]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(colExpr.as("r")).head().getDouble(0)
  }

  test("dot product of known vectors") {
    val d = one(VectorFunctions.dotD(col("a"), col("b")),
      Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    assert(math.abs(d - 32.0) < 1e-9)
  }

  test("cosine of identical vectors is 1") {
    val c = one(VectorFunctions.cosine(col("a"), col("b")),
      Array(0.5f, -0.25f, 2f), Array(0.5f, -0.25f, 2f))
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("cosine of orthogonal vectors is 0") {
    val c = one(VectorFunctions.cosine(col("a"), col("b")),
      Array(1f, 0f), Array(0f, 1f))
    assert(math.abs(c) < 1e-9)
  }

  test("l2normalize yields unit norm") {
    import spark.implicits._
    val n = Seq(Tuple1(Array(3f, 4f))).toDF("a")
      .select(VectorFunctions.norm2(VectorFunctions.l2normalize(col("a"))).as("n"))
      .head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-9)
  }

  test("signBucket maps sign pattern to expected bits") {
    import spark.implicits._
    // dims 1..4 signs: +,-,+,+ → bits 1,0,1,1 → 1 + 4 + 8 = 13
    val b = Seq(Tuple1(Array(0.5f, -0.5f, 0.1f, 2f))).toDF("a")
      .select(VectorFunctions.signBucket(col("a"), 4).as("b"))
      .head().getLong(0)
    assert(b == 13L)
  }
}
