package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-layout helpers: co-locate big-table joins by pre-hashing
  * both sides into the same bucket scheme so the join needs no shuffle
  * at read time (the open-format analog of the reference's secondary
  * indexes, SURVEY O4 — at 100 TB this is the difference between a
  * full-fact-table exchange and none).
  */
object Bucketing {

  /** Write `df` as a bucketed external table (sorted within buckets on
    * the same key, so the sort side of a sort-merge join is free too).
    */
  def writeBucketed(df: DataFrame, path: String, table: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — with matching
    * bucket counts Spark plans a sort-merge join with zero Exchange
    * operators.
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
