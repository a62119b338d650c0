package graft.workflow

import java.nio.file.Files
import java.sql.Timestamp

import graft.{Alma, SparkSpec}

/** Facade-level workflow-state API (reference core.py:546-650, 821-850,
  * 1325-1368): checkpoint create/skip/resume/cleanup chains and bulk
  * usage recording, end-to-end through Alma + MemoryStore.
  */
class WorkflowFacadeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshAlma(): Alma =
    Alma(spark, Files.createTempDirectory("alma-wf").toString, projectId = "proj1")

  test("checkpoint sequences per branch and chains parents") {
    val alma = freshAlma()
    val c0 = alma.checkpoint("run1", "nodeA", """{"step":0}""", ts("2024-01-01 10:00:00")).get
    val c1 = alma.checkpoint("run1", "nodeB", """{"step":1}""", ts("2024-01-01 10:01:00")).get
    val b0 = alma.checkpoint("run1", "nodeC", """{"step":0}""",
      ts("2024-01-01 10:02:00"), branchId = "fork").get
    assert(c0.sequenceNumber == 0L && c1.sequenceNumber == 1L)
    assert(c1.parentCheckpointId.contains(c0.id))
    assert(b0.sequenceNumber == 0L && b0.parentCheckpointId.isEmpty)
  }

  test("skipIfUnchanged suppresses a checkpoint identical to the branch tip") {
    val alma = freshAlma()
    alma.checkpoint("run1", "nodeA", """{"x":1}""", ts("2024-01-01 10:00:00"))
    assert(alma.checkpoint("run1", "nodeA", """{"x":1}""", ts("2024-01-01 10:01:00")).isEmpty)
    assert(alma.checkpoint("run1", "nodeA", """{"x":2}""", ts("2024-01-01 10:02:00")).isDefined)
    assert(alma.store.checkpoints(Some("run1")).count() == 2L)
  }

  test("getResumePoint returns the highest-sequence checkpoint, per branch when asked") {
    val alma = freshAlma()
    alma.checkpoint("run1", "a", """{"s":0}""", ts("2024-01-01 10:00:00"))
    val tip = alma.checkpoint("run1", "b", """{"s":1}""", ts("2024-01-01 10:01:00")).get
    val forkTip = alma.checkpoint("run1", "c", """{"s":9}""",
      ts("2024-01-01 10:02:00"), branchId = "fork").get
    assert(alma.getResumePoint("run1").map(_.id).contains(tip.id))
    assert(alma.getResumePoint("run1", Some("fork")).map(_.id).contains(forkTip.id))
    assert(alma.getResumePoint("ghost").isEmpty)
  }

  test("cleanupCheckpoints keeps the latest N per branch and only touches that run") {
    val alma = freshAlma()
    (0 to 3).foreach { i =>
      alma.checkpoint("run1", s"n$i", s"""{"s":$i}""", ts(s"2024-01-01 10:0$i:00"))
    }
    alma.checkpoint("run2", "other", """{"s":0}""", ts("2024-01-01 11:00:00"))
    val deleted = alma.cleanupCheckpoints("run1", keepLatest = 1)
    assert(deleted == 3L)
    val left = alma.store.checkpoints(Some("run1")).collect()
    assert(left.length == 1 && left.head.sequenceNumber == 3L)
    assert(alma.store.checkpoints(Some("run2")).count() == 1L)
  }

  test("mergeStates applies named reducers with last_value default") {
    val alma = freshAlma()
    val merged = alma.mergeStates(
      Seq(Map("count" -> "5", "items" -> "a", "owner" -> "x"),
        Map("count" -> "3", "items" -> "b", "owner" -> "y")),
      reducerConfig = Map("count" -> "sum", "items" -> "append"))
    assert(merged("count") == "8") // integral sum renders like the reference's int, not "8.0"
    assert(merged("items") == "a,b")
    assert(merged("owner") == "y")
  }

  test("min/max reducers compare numerically, not lexicographically") {
    val alma = freshAlma()
    // Lexicographic string max would keep "9"; the reference's reducers
    // are numeric-only (reducers.py:145-190) and non-numeric values are
    // ignored, never compared.
    val merged = alma.mergeStates(
      Seq(Map("retries" -> "9", "cost" -> "10.5", "note" -> "n/a", "tag" -> "x"),
        Map("retries" -> "10", "cost" -> "2.5", "note" -> "n/a", "tag" -> "y")),
      reducerConfig = Map("retries" -> "max", "cost" -> "min",
        "note" -> "max", "tag" -> "sum"))
    assert(merged("retries") == "10", s"lexicographic max: ${merged("retries")}")
    assert(merged("cost") == "2.5")
    assert(merged("note") == null, "non-numeric values must be ignored by max")
    // Reference SumReducer starts at 0: all-non-numeric sums to int 0, not null.
    assert(merged("tag") == "0", s"sum of non-numeric: ${merged("tag")}")
  }

  test("recordUsage marks used vs ignored and feeds the feedback summary") {
    val alma = freshAlma()
    val ids = alma.recordUsage(
      retrievedIds = Seq("m1", "m2", "m3"),
      usedIds = Set("m2"),
      memoryType = graft.storage.MemoryType.Heuristics,
      agent = "helena",
      asOf = ts("2024-01-01 10:00:00"))
    assert(ids.length == 3)
    val fb = alma.store.feedback(Some("proj1")).collect()
    assert(fb.count(_.signal == "used") == 1)
    assert(fb.count(_.signal == "ignored") == 2)
    val summary = alma.store.feedbackSummary(Some("proj1")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(summary("m2") == 1.0 && summary("m1") == -1.0)
  }
}
