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
