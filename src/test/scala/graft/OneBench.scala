package graft
object OneBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      // toRdd, not count(): same reasoning as Bench.runOnce — time the
      // query's own plan, not a count-rewrite Catalyst can prune.
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(s"RUN$i $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
