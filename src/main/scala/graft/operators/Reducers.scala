package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Workflow state reducers — the name→aggregate registry used to merge
  * parallel branch states key-wise (reference: alma/workflow/reducers.py:50-254:
  * append / last_value / first_value / sum / max / min / union). Each
  * reducer maps 1:1 onto a Spark aggregate function; `union` dedups via
  * collect_set, `append` preserves arrival order via a sort column
  * (deterministic merges require an explicit order column — the
  * reference gets ordering implicitly from sequential execution, which
  * a distributed engine must not rely on).
  */
object Reducers {

  /** Order-sensitive reducers take (value, order) so results are
    * deterministic under parallelism.
    */
  def apply(name: String, value: Column, order: Column): Column = name match {
    case "sum" => sum(value)
    case "max" => max(value)
    case "min" => min(value)
    case "first_value" => min_by(value, order)
    case "last_value" => max_by(value, order)
    case "append" =>
      // Sort by the order key, then keep only the values — callers get
      // the reference's flat ordered list, not (order, value) pairs.
      transform(array_sort(collect_list(struct(order.as("o"), value.as("v")))),
        s => s.getField("v"))
    case "union" => array_sort(collect_set(value))
    case other => throw new IllegalArgumentException(s"unknown reducer: $other")
  }

  val names: Seq[String] =
    Seq("sum", "max", "min", "first_value", "last_value", "append", "union")
}
