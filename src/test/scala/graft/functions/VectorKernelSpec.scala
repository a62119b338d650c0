package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen kernels must be bit-identical to the HOF formulation they
  * replaced (same double accumulation order), and actually codegen.
  */
class VectorKernelSpec extends SparkSpec {

  private def emb = graft.io.Tables.embeddings(spark, Sf).limit(100)

  test("kernel dot == HOF dot bit-exactly on real embeddings") {
    val diff = emb.as("a").crossJoin(emb.as("b")).limit(500)
      .select(
        VectorFunctions.dotD(col("a.embedding"), col("b.embedding")).as("k"),
        VectorFunctions.dotHof(col("a.embedding"), col("b.embedding")).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diff == 0)
  }

  test("kernel cosine == HOF cosine bit-exactly on real embeddings") {
    val diff = emb.as("a").crossJoin(emb.as("b")).limit(500)
      .select(
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("k"),
        VectorFunctions.cosineHof(col("a.embedding"), col("b.embedding")).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diff == 0)
  }

  test("kernel survives whole-stage codegen (no fallback in plan)") {
    val df = emb.select(VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
    // Whole-stage-codegen'd operators print with a `*(stageId)` prefix.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosinesimf32"), s"expected codegen span in:\n$plan")
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-9)
  }

  test("length-mismatched vectors yield NULL, matching the HOF null semantics") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val kernel = df.select(
      VectorFunctions.dotD(col("a"), col("b")).as("d"),
      VectorFunctions.cosine(col("a"), col("b")).as("c")).head()
    assert(kernel.isNullAt(0) && kernel.isNullAt(1))
    val hof = df.select(VectorFunctions.dotHof(col("a"), col("b")).as("d")).head()
    assert(hof.isNullAt(0))
  }

  test("kernel rejects non-float-array inputs at analysis") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorFunctions.dotD(col("a"), col("b"))).collect()
    }
  }
}
