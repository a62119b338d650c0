package graft.storage

import java.sql.Timestamp

import graft.SparkSpec
import graft.workflow.Checkpoint
import org.apache.hadoop.fs.{Path => HPath}

/** Per-run partitioned checkpoint storage: a run's state lives in its
  * own versioned sub-table, so run-scoped reads touch one partition and
  * cleanupCheckpoints rewrites one partition — pinned here at the
  * FILESYSTEM level, not just through result equality.
  */
class CheckpointPartitionSpec extends SparkSpec {

  private def ck(id: String, run: String, branch: String, seq: Long): Checkpoint =
    Checkpoint(id, run, "node", branch, seq, None, s"""{"v":$seq}""",
      new Timestamp(1700000000000L + seq))

  private def freshStore(tag: String): (MemoryStore, String) = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ckpart_$tag"
    val p = new HPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    (new MemoryStore(spark, root), root)
  }

  private def listing(root: String, sub: String): Set[String] = {
    val dir = new HPath(s"$root/${MemoryType.Checkpoints}/$sub")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(st =>
      s"${st.getPath.getName}:${st.getModificationTime}").toSet
  }

  test("a run-scoped read plans files from that run's partition only") {
    val (store, _) = freshStore("read")
    store.saveCheckpoints(Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("b1", "runB", "b0", 1)))
    val one = store.checkpoints(Some("runA"))
    assert(one.count() == 2L)
    val files = one.toDF().inputFiles
    assert(files.nonEmpty && files.forall(_.contains("runId=runA")),
      s"run-scoped read escaped its partition:\n${files.mkString("\n")}")
  }

  test("cleanupCheckpoints rewrites the completed run's partition and no other") {
    val (store, root) = freshStore("cleanup")
    store.saveCheckpoints(Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("a3", "runA", "b0", 3), ck("a4", "runA", "b1", 4),
      ck("b1", "runB", "b0", 1), ck("b2", "runB", "b0", 2)))
    val beforeB = listing(root, "runId=runB")
    assert(beforeB.nonEmpty, "runB partition missing before cleanup")
    val deleted = store.cleanupCheckpoints("runA", keepLatest = 1)
    assert(deleted == 2L, s"expected the two over-quota runA rows, got $deleted")
    // runA survivors: latest per branch
    val left = store.checkpoints(Some("runA")).collect().map(_.id).sorted
    assert(left.toSeq == Seq("a3", "a4"), s"wrong survivors: ${left.mkString(",")}")
    // runB's partition: same snapshot dirs, same mtimes — never read,
    // never rewritten.
    assert(listing(root, "runId=runB") == beforeB,
      "cleanup touched an unrelated run's partition")
    assert(store.checkpoints(Some("runB")).count() == 2L)
    // the cross-run union still sees everything
    assert(store.checkpoints().count() == 4L)
  }

  test("a legacy single-table checkpoint store migrates into per-run partitions on first access") {
    val (store, root) = freshStore("legacy")
    // Simulate a store written BEFORE the per-run layout: one versioned
    // snapshot directly under the checkpoints root plus a root _CURRENT
    // marker — exactly what commitSnapshot produced then.
    import spark.implicits._
    val rows = Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("b1", "runB", "b0", 1))
    val snapName = "snap_000001_deadbeef"
    val ckRoot = s"$root/${MemoryType.Checkpoints}"
    rows.toDS().toDF().write.parquet(s"$ckRoot/$snapName")
    val fs = new HPath(ckRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new HPath(s"$ckRoot/_CURRENT"), true)
    try out.write(snapName.getBytes("UTF-8")) finally out.close()
    // First read sees every legacy row — not a silently-empty table
    // (this IS the crash-recovery path).
    val got = store.checkpoints().collect().map(_.id).sorted
    assert(got.toSeq == Seq("a1", "a2", "b1"),
      s"legacy checkpoints lost in migration: ${got.mkString(",")}")
    // Rows now live in per-run partitions; the legacy root snapshot and
    // marker are gone (vacuum has nothing legacy left to orphan).
    assert(store.checkpoints(Some("runA")).count() == 2L)
    assert(store.checkpoints(Some("runB")).count() == 1L)
    assert(!fs.exists(new HPath(s"$ckRoot/$snapName")), "legacy snapshot not reclaimed")
    assert(!fs.exists(new HPath(s"$ckRoot/_CURRENT")), "legacy marker not removed")
    // And the per-run maintenance paths work on the migrated rows.
    assert(store.cleanupCheckpoints("runA", keepLatest = 1) == 1L)
    assert(store.checkpoints().count() == 2L)
  }

  test("checkpoint rows with a null runId are rejected loudly, not NPE'd") {
    val (store, _) = freshStore("nullrun")
    val sch = org.apache.spark.sql.types.StructType(
      store.checkpoints().toDF().schema.map(_.copy(nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(
        "x1", null, "node", "b0", 1L, null, "{}",
        new Timestamp(1700000000000L))),
      sch)
    val e = intercept[IllegalArgumentException] {
      store.appendRows(df, MemoryType.Checkpoints)
    }
    assert(e.getMessage.contains("runId"))
  }

  test("compact(checkpoints) compacts every run partition instead of root-level no-op") {
    val (store, _) = freshStore("compact")
    // 20 single-row appends ⇒ ≥ 20 files in runA's partition — the
    // append-per-step fragmentation pattern compaction exists for.
    (1 to 20).foreach(i => store.saveCheckpoints(Seq(ck(s"a$i", "runA", "b0", i.toLong))))
    store.saveCheckpoints(Seq(ck("b1", "runB", "b0", 1)))
    val before = store.compact(MemoryType.Checkpoints, minFiles = 16, targetPartitions = 1)
    assert(before >= 20L, s"expected the fragmented partition's files counted, got $before")
    // rows intact, and the rewritten partition is actually few files now
    assert(store.checkpoints().count() == 21L)
    val after = store.compact(MemoryType.Checkpoints, minFiles = 16, targetPartitions = 1)
    assert(after < before, s"compaction did not reduce files: $before -> $after")
    assert(store.checkpoints(Some("runA")).count() == 20L)
  }

  test("runIds with path-hostile characters round-trip through encoding") {
    val (store, _) = freshStore("enc")
    val weird = "run/α β?=#1"
    store.saveCheckpoints(Seq(ck("w1", weird, "b0", 1)))
    val got = store.checkpoints(Some(weird)).collect()
    assert(got.length == 1 && got.head.runId == weird)
    assert(store.checkpoints().count() == 1L)
    assert(store.cleanupCheckpoints(weird, keepLatest = 1) == 0L)
  }
}
