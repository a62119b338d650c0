package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReducersSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      ("k1", 1L, 10.0, "a"),
      ("k1", 2L, 30.0, "b"),
      ("k1", 3L, 20.0, "a"),
      ("k2", 1L, 5.0, "c")).toDF("key", "seq", "v", "tag")
  }

  test("numeric reducers: sum/min/max") {
    val r = df.groupBy("key").agg(
      Reducers("sum", col("v"), col("seq")).as("s"),
      Reducers("min", col("v"), col("seq")).as("mn"),
      Reducers("max", col("v"), col("seq")).as("mx"))
      .orderBy("key").collect()
    assert(r(0).getDouble(1) == 60.0 && r(0).getDouble(2) == 10.0 && r(0).getDouble(3) == 30.0)
    assert(r(1).getDouble(1) == 5.0)
  }

  test("order-sensitive reducers: first/last by sequence") {
    val r = df.groupBy("key").agg(
      Reducers("first_value", col("v"), col("seq")).as("f"),
      Reducers("last_value", col("v"), col("seq")).as("l"))
      .orderBy("key").collect()
    assert(r(0).getDouble(1) == 10.0 && r(0).getDouble(2) == 20.0)
  }

  test("append preserves sequence order; union dedups") {
    val r = df.groupBy("key").agg(
      Reducers("append", col("tag"), col("seq")).as("ap"),
      Reducers("union", col("tag"), col("seq")).as("un"))
      .orderBy("key").collect()
    assert(r(0).getSeq[String](1) == Seq("a", "b", "a"))
    assert(r(0).getSeq[String](2) == Seq("a", "b"))
  }

  test("unknown reducer throws") {
    intercept[IllegalArgumentException](Reducers("median", col("v"), col("seq")))
  }
}
