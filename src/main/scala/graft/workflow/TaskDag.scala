package graft.workflow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Task-dependency DAG machinery — the benchmark surface the reference
  * scaffolds in benchmarks/task_dependency/ (dag_generator.py:1-227
  * defines six DAG shapes and the ready-task oracle; runner.py:1-54 is
  * an unwired stub awaiting its task API). Here the resolution API
  * exists, so the benchmark runs for real: DAGs are (tasks, edges)
  * DataFrames, and readiness is TWO anti-joins — no driver-side
  * adjacency maps, so a 10-million-task DAG resolves exactly like a
  * 10-task one.
  *
  *   - readyTasks: a task is ready iff it is not completed and no
  *     incoming edge originates from an incomplete task (the oracle's
  *     `deps ⊆ completed`, dag_generator.py:185-227, as a left-anti
  *     join against the blocked set)
  *   - topoWaves: Kahn layering by iterated peeling — wave k = tasks
  *     whose dependencies all sit in waves < k; the residual after
  *     |V| stalls is exactly the cycle-trapped set, so cycle rejection
  *     falls out of the same loop (the `cyclic` shape must be refused)
  */
object TaskDag {

  /** Generate a named-shape DAG (dag_generator.py's six shapes, same
    * ids, edges, and clamping rules). Edges are (from, to): `from`
    * must complete before `to` may start.
    */
  def generateDag(shape: String, n: Int): (Seq[String], Seq[(String, String)]) = shape match {
    case "chain" =>
      val m = math.max(n, 2)
      ((0 until m).map(i => s"t$i"),
        (0 until m - 1).map(i => (s"t$i", s"t${i + 1}")))
    case "diamond" =>
      val m = math.max(n, 4)
      val mid = (1 until m - 1).map(i => s"t$i")
      ((0 until m).map(i => s"t$i"),
        mid.map(t => ("t0", t)) ++ mid.map(t => (t, s"t${m - 1}")))
    case "wide_fan" =>
      val m = math.max(n, 2)
      ((0 until m).map(i => s"t$i"), (1 until m).map(i => ("t0", s"t$i")))
    case "deep_narrow" =>
      val m = math.max(n, 2)
      val ids = (0 until m).flatMap(l => Seq(s"t${l * 2}", s"t${l * 2 + 1}"))
      val edges = (1 until m).flatMap(l => Seq(
        (s"t${(l - 1) * 2}", s"t${l * 2}"),
        (s"t${(l - 1) * 2 + 1}", s"t${l * 2 + 1}")))
      (ids, edges)
    case "forest" =>
      val chains = 10
      val len = math.max(n / chains, 2)
      val ids = for (c <- 0 until chains; p <- 0 until len) yield s"c${c}_t$p"
      val edges = for (c <- 0 until chains; p <- 1 until len)
        yield (s"c${c}_t${p - 1}", s"c${c}_t$p")
      (ids, edges)
    case "cyclic" =>
      val m = math.max(n, 3)
      ((0 until m).map(i => s"t$i"),
        (0 until m - 1).map(i => (s"t$i", s"t${i + 1}")) :+ (s"t${m - 1}", "t0"))
    case other => throw new IllegalArgumentException(
      s"Unknown shape '$other'. Valid shapes: chain, cyclic, deep_narrow, diamond, forest, wide_fan")
  }

  def toFrames(spark: SparkSession, dag: (Seq[String], Seq[(String, String)])): (DataFrame, DataFrame) = {
    import spark.implicits._
    (dag._1.toDF("task_id"), dag._2.toDF("from_id", "to_id"))
  }

  /** Tasks ready to execute: not completed, and every dependency
    * completed. `completed` is a one-column (task_id) frame. Two
    * anti-joins — the blocked set is `to`s of edges whose `from` is
    * incomplete; ready = pending ∖ blocked. Distributed end to end:
    * nothing is collected, the DAG never leaves the executors.
    */
  def readyTasks(tasks: DataFrame, edges: DataFrame, completed: DataFrame): DataFrame = {
    val done = completed.select(col("task_id")).distinct()
    val pending = tasks.join(done, Seq("task_id"), "left_anti")
    val blocked = edges
      .join(done.withColumnRenamed("task_id", "from_id"), Seq("from_id"), "left_anti")
      .select(col("to_id").as("task_id")).distinct()
    pending.join(blocked, Seq("task_id"), "left_anti")
  }

  /** Kahn topological layering: wave k holds the tasks whose every
    * dependency lies in an earlier wave (wave 0 = no dependencies).
    * Returns (task_id, wave). Throws on a cycle — when a peel round
    * unblocks nothing while tasks remain, the remainder is
    * cycle-trapped and is named in the error. Each round is one
    * readiness plan over the residual; the frontier is checkpointed so
    * round r's plan does not replay rounds 0..r-1.
    */
  def topoWaves(spark: SparkSession, tasks: DataFrame, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val total = tasks.count()
    var doneWaves: DataFrame = Seq.empty[(String, Long)].toDF("task_id", "wave")
    var doneCount = 0L
    var wave = 0L
    while (doneCount < total) {
      // One checkpoint + one count per peel round: the frontier is
      // folded into the accumulated frame before materializing, and
      // the unblocked count is read off the checkpointed total.
      val frontier = readyTasks(tasks, edges, doneWaves.select("task_id"))
        .withColumn("wave", lit(wave))
      // union grows the partition count by the frontier's every round —
      // unpinned, a 100-wave chain accumulates thousands of partitions
      // and per-wave cost climbs superlinearly (measured: 2.2 s/wave by
      // wave 100 vs 0.1 s/wave pinned). Coalesce back to the session's
      // parallelism before the checkpoint: that IS the executor-slot
      // count on a cluster, so wide frontiers keep every slot busy
      // instead of funneling each peel round through a fixed pin.
      doneWaves = doneWaves.unionByName(frontier)
        .coalesce(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val newCount = doneWaves.count()
      if (newCount == doneCount) {
        val stuck = tasks.join(doneWaves, Seq("task_id"), "left_anti")
          .orderBy("task_id").limit(10)
          .collect().map(_.getString(0)).mkString(", ")
        throw new IllegalArgumentException(
          s"cycle detected: ${total - doneCount} task(s) can never become ready (e.g. $stuck)")
      }
      doneCount = newCount
      wave += 1
    }
    doneWaves
  }

  /** True iff the dependency graph admits a full topological order. */
  def isAcyclic(spark: SparkSession, tasks: DataFrame, edges: DataFrame): Boolean =
    try { topoWaves(spark, tasks, edges); true }
    catch { case _: IllegalArgumentException => false }

  /** Driver-side oracle, a transliteration of the reference's
    * get_expected_ready_tasks (dag_generator.py:185-227) — used by the
    * benchmark to verify the distributed resolution, never by it.
    */
  def expectedReady(taskIds: Seq[String], edges: Seq[(String, String)],
      completed: Set[String]): Set[String] = {
    val deps = edges.groupBy(_._2).map { case (to, es) => to -> es.map(_._1).toSet }
    taskIds.filterNot(completed)
      .filter(t => deps.getOrElse(t, Set.empty).subsetOf(completed))
      .toSet
  }
}
