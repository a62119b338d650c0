package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-located bucketed join plans with zero Exchange operators") {
    val dir = Files.createTempDirectory("bucketing").toString
    val orders = graft.io.Tables.orders(spark, Sf)
    val customer = graft.io.Tables.customer(spark, Sf)
    Bucketing.writeBucketed(orders, s"$dir/orders", "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      s"$dir/customer", "b_customer", "o_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$plan")
      // Same result as the plain join.
      val expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
