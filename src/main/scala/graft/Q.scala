package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * used by the driver's correctness gate. Column names and types must
  * match exactly between the two.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def pack(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracles(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
