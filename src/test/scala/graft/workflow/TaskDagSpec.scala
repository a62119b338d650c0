package graft.workflow

import graft.SparkSpec

/** Task-dependency DAG resolution — the contract the reference's
  * dag_generator.py pins in its doctests (diamond readiness sequence,
  * shape structure, cycle rejection) plus the distributed/oracle
  * agreement the scaffolded runner was meant to measure.
  */
class TaskDagSpec extends SparkSpec {

  private def ready(dag: (Seq[String], Seq[(String, String)]), done: Set[String]): Set[String] = {
    import spark.implicits._
    val (tasks, edges) = TaskDag.toFrames(spark, dag)
    TaskDag.readyTasks(tasks, edges, done.toSeq.toDF("task_id"))
      .collect().map(_.getString(0)).toSet
  }

  test("diamond readiness follows the reference doctest sequence") {
    val dag = TaskDag.generateDag("diamond", 4)
    assert(ready(dag, Set.empty) == Set("t0"))
    assert(ready(dag, Set("t0")) == Set("t1", "t2"))
    assert(ready(dag, Set("t0", "t1")) == Set("t2"))
    assert(ready(dag, Set("t0", "t1", "t2")) == Set("t3"))
    assert(ready(dag, Set("t0", "t1", "t2", "t3")) == Set.empty)
  }

  test("shape structure: chain, wide_fan, deep_narrow, forest sizes and clamps") {
    val (chainIds, chainEdges) = TaskDag.generateDag("chain", 4)
    assert(chainIds == Seq("t0", "t1", "t2", "t3"))
    assert(chainEdges == Seq(("t0", "t1"), ("t1", "t2"), ("t2", "t3")))
    // Clamping: below-minimum sizes are raised, not rejected.
    assert(TaskDag.generateDag("chain", 0)._1.size == 2)
    assert(TaskDag.generateDag("diamond", 1)._1.size == 4)
    val (fanIds, fanEdges) = TaskDag.generateDag("wide_fan", 6)
    assert(fanEdges.forall(_._1 == "t0") && fanEdges.size == 5 && fanIds.size == 6)
    val (dnIds, dnEdges) = TaskDag.generateDag("deep_narrow", 3)
    assert(dnIds.size == 6 && dnEdges.size == 4)
    val (fIds, fEdges) = TaskDag.generateDag("forest", 40)
    assert(fIds.size == 40 && fEdges.size == 30)
    assert(fIds.count(_.startsWith("c0_")) == 4)
    intercept[IllegalArgumentException] { TaskDag.generateDag("mobius", 5) }
  }

  test("wide_fan: completing the root unblocks every leaf at once") {
    val dag = TaskDag.generateDag("wide_fan", 8)
    assert(ready(dag, Set.empty) == Set("t0"))
    assert(ready(dag, Set("t0")) == (1 until 8).map(i => s"t$i").toSet)
  }

  test("forest chains are isolated: progress in one chain never unblocks another") {
    val dag = TaskDag.generateDag("forest", 30)
    val base = ready(dag, Set.empty)
    assert(base == (0 until 10).map(c => s"c${c}_t0").toSet)
    val after = ready(dag, Set("c3_t0", "c3_t1"))
    assert(after == (base - "c3_t0") + "c3_t2")
  }

  test("topoWaves matches the oracle on every wave for every acyclic shape") {
    for (shape <- Seq("chain", "diamond", "wide_fan", "deep_narrow", "forest")) {
      val r = graft.TaskDepRunner.runShape(spark, shape, 20)
      assert(r.ok, s"$shape: wave-by-wave oracle verification failed")
      assert(r.verifiedWaves == r.waves, s"$shape: ${r.verifiedWaves}/${r.waves} waves verified")
    }
  }

  test("wave counts match each shape's known depth") {
    def waves(shape: String, n: Int) = graft.TaskDepRunner.runShape(spark, shape, n).waves
    assert(waves("chain", 12) == 12)
    assert(waves("diamond", 10) == 3)
    assert(waves("wide_fan", 12) == 2)
    assert(waves("deep_narrow", 7) == 7)
    assert(waves("forest", 40) == 4)
  }

  test("cyclic DAG is rejected with the trapped tasks named") {
    val (tasks, edges) = TaskDag.toFrames(spark, TaskDag.generateDag("cyclic", 5))
    val e = intercept[IllegalArgumentException] {
      TaskDag.topoWaves(spark, tasks, edges)
    }
    assert(e.getMessage.contains("cycle detected"))
    assert(e.getMessage.contains("t0"))
    assert(!TaskDag.isAcyclic(spark, tasks, edges))
  }

  test("partial cycle: the acyclic prefix resolves, only the trapped set is rejected") {
    import spark.implicits._
    // a -> b -> c, plus d <-> e (2-cycle): readiness still works for
    // the acyclic part, and the cycle error names only d/e.
    val tasks = Seq("a", "b", "c", "d", "e").toDF("task_id")
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e"), ("e", "d")).toDF("from_id", "to_id")
    val r0 = TaskDag.readyTasks(tasks, edges, Seq.empty[String].toDF("task_id"))
      .collect().map(_.getString(0)).toSet
    assert(r0 == Set("a"))
    val e1 = intercept[IllegalArgumentException] {
      TaskDag.topoWaves(spark, tasks, edges)
    }
    assert(e1.getMessage.contains("2 task(s)"))
  }
}
