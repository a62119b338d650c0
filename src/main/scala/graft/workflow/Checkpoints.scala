package graft.workflow

import java.sql.Timestamp

import graft.operators.Reducers
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Workflow state: checkpoints, parent chains, and branch-state merging
  * (reference: alma/workflow/checkpoint.py:21-135 model, :228-257
  * latest-per-(run, branch); alma/workflow/reducers.py:294-363 merge).
  */
final case class Checkpoint(
    id: String,
    runId: String,
    nodeId: String,
    branchId: String,
    sequenceNumber: Long,
    parentCheckpointId: Option[String],
    stateJson: String,
    createdAt: Timestamp)

object Checkpoints {

  /** SHA-256 state hash of the canonical state (checkpoint.py:60-70),
    * as a column so integrity checks run distributed.
    */
  def withStateHash(df: DataFrame): DataFrame =
    df.withColumn("state_hash", sha2(col("stateJson").cast("binary"), 256))

  /** J10: latest checkpoint per (run, branch). */
  def latest(checkpoints: Dataset[Checkpoint]): DataFrame = {
    val w = Window.partitionBy("runId", "branchId")
      .orderBy(col("sequenceNumber").desc, col("id"))
    checkpoints.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Parent chain from a checkpoint back to the root (J10). A chain
    * never crosses runs, so the lookup is one pushed-down point filter
    * to resolve the run, then a collect of THAT run's checkpoints only
    * (bounded by run length, not table size) and an in-memory walk.
    */
  def parentChain(checkpoints: Dataset[Checkpoint], fromId: String): Seq[Checkpoint] = {
    checkpoints.filter(col("id") === fromId).take(1).headOption match {
      case None => Seq.empty
      case Some(from) =>
        val byId = checkpoints.filter(col("runId") === from.runId)
          .collect().map(c => c.id -> c).toMap
        Iterator.iterate(Option(from))(c => c.flatMap(_.parentCheckpointId).flatMap(byId.get))
          .takeWhile(_.isDefined).flatten.toSeq
    }
  }

  /** Merge parallel branch states key-wise with named reducers
    * (reducers.py:294-363): state rows are (branch, key, value, seq);
    * the reducer registry (A6) picks the aggregate per key.
    *
    * Numeric domain: values flow through double, so integral rendering
    * is exact only strictly inside ±2^53 (the reference's Python ints
    * are arbitrary-precision). At or beyond that the integrality test
    * is unreliable — a magnitude guard routes such results to the
    * plain double rendering instead of fabricating a wrong long.
    */
  def mergeBranchStates(
      states: DataFrame,
      reducerByKey: Map[String, String],
      defaultReducer: String = "last_value"): DataFrame = {
    // List-valued reducers render as comma-joined values; scalars cast.
    // Numeric reducers see only numeric-parsing values (reference
    // reducers.py:145-190: non-numeric values are IGNORED by sum/max/
    // min, and the comparison is numeric) — state values are strings
    // here, and a string max would otherwise compare lexicographically
    // ("9" > "10").
    val NumRe = "^-?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?$"
    // Numeric results pass through double internally, but rendering is
    // TYPE-PRESERVING like the reference: Python's int('10') + int('3')
    // is int 13 → "13", while float('10.0') anywhere in the mix makes
    // the sum a float → "13.0". Integral-vs-float is decided by the
    // contributing values' own SYNTAX (a '.' or exponent marks a
    // float), not just the result's integrality — sum tracks whether
    // ANY numeric input was float-syntax (int+float=float in Python);
    // max/min track the WINNING value's syntax (Python max(10, 3.5) is
    // the int 10 → "10"). (NaN/±Inf fail the integrality test and
    // render as-is.)
    val isNum = col("value").rlike(NumRe)
    val parsed = when(isNum, col("value").cast("double"))
    val floatSyntax = isNum && col("value").rlike("[.eE]")
    def numStr(c: Column, renderFloat: Column): Column =
      when(c.isNull, lit(null).cast("string"))
        .when(!coalesce(renderFloat, lit(false))
          // At or past 2^53 a double can't certify integrality (2^53
          // itself is reachable from both 2^53 and 2^53+1; beyond, a
          // long cast may overflow): render via double instead of a
          // possibly-wrong long. See the method scaladoc.
          && abs(c) < lit(9007199254740992.0)
          && (c === c.cast("long").cast("double")), c.cast("long").cast("string"))
        .otherwise(c.cast("string"))
    def rendered(reducer: String): Column = reducer match {
      case "append" | "union" => array_join(Reducers(reducer, col("value"), col("seq")), ",")
      case "sum" =>
        // Reference SumReducer starts its accumulator at 0, so an
        // all-non-numeric key sums to 0 — not null like max/min.
        numStr(coalesce(Reducers("sum", parsed, col("seq")), lit(0.0)),
          max(when(floatSyntax, 1L).otherwise(0L)) === 1L)
      case r @ ("max" | "min") =>
        // The winner among numeric values, ties broken toward the
        // FIRST arrival (struct ordering: value first, then seq —
        // negated for max so the smallest seq wins the tie), matching
        // Python max/min keeping the first maximal/minimal element.
        val winner =
          if (r == "max") max_by(col("value"), when(isNum, struct(parsed, -col("seq"))))
          else min_by(col("value"), when(isNum, struct(parsed, col("seq"))))
        numStr(Reducers(r, parsed, col("seq")), winner.rlike("[.eE]"))
      case r => Reducers(r, col("value"), col("seq")).cast("string")
    }
    val merged = reducerByKey.toSeq.sortBy(_._1).map { case (k, reducer) =>
      states.filter(col("key") === k)
        .groupBy("key")
        .agg(rendered(reducer).as("merged"))
    }
    val otherKeys = states.filter(!col("key").isin(reducerByKey.keySet.toSeq: _*))
      .groupBy("key")
      .agg(rendered(defaultReducer).as("merged"))
    merged.foldLeft(otherKeys)(_ unionByName _).orderBy("key")
  }
}
