package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the benchmark tables (TPC-H-ish star schema + events +
  * documents + embeddings), mirroring the reference's storage scans
  * (reference: alma/storage/sqlite_local.py:934-983) as plain Parquet
  * scans so Catalyst gets native predicate/column pushdown.
  *
  * Scale note: at 100 TB these reads become partitioned-directory scans;
  * nothing here materializes data on the driver.
  */
object Tables {

  /** Read one table. `events.ts` is written as parquet TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects; we read it as raw long
    * nanos (legacy conf) and convert to a microsecond TimestampType
    * column so downstream operators see a normal timestamp.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      // The generator has shipped three physical encodings of `ts` across
      // rounds; normalize all of them to TimestampType (micros) so every
      // downstream unix_micros()/window sees one type:
      //  - TIMESTAMP(NANOS): surfaces as a raw long under the legacy conf
      //  - TIMESTAMP_NTZ (isAdjustedToUTC=false): cast via the session
      //    time zone — every entrypoint pins spark.sql.session.timeZone
      //    to UTC, so the wall clock maps 1:1 onto epoch micros exactly
      //    as DuckDB reads the same naive values
      //  - TIMESTAMP(MICROS): already what we want
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Spread a narrow scan across all cores before CPU-heavy per-row
    * work (shingling, hashing, embedding). A single-file input with one
    * row group plans as ONE task no matter what
    * spark.sql.files.maxPartitionBytes says (parquet cannot split
    * inside a row group), which serializes the whole transform on one
    * core. The repartition fires only when the scan's parallelism is
    * below the session default — on a real 100 TB layout the scan
    * already has thousands of splits and this adds no shuffle.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
