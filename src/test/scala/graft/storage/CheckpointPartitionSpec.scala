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

  import CheckpointFixtures.ck

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

  private def writeLegacy(root: String, rows: Seq[Checkpoint],
      snapName: String = "snap_000001_deadbeef"): String =
    CheckpointFixtures.writeLegacy(spark, root, rows, snapName)

  test("a legacy store: reads are pure (union, no writes); a write entry point migrates") {
    val (store, root) = freshStore("legacy")
    val ckRoot = writeLegacy(root, Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("b1", "runB", "b0", 1)))
    val fs = new HPath(ckRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapName = "snap_000001_deadbeef"
    // First read sees every legacy row — not a silently-empty table
    // (this IS the crash-recovery path) — and run-scoped reads work too.
    val got = store.checkpoints().collect().map(_.id).sorted
    assert(got.toSeq == Seq("a1", "a2", "b1"),
      s"legacy checkpoints invisible to a reader: ${got.mkString(",")}")
    assert(store.checkpoints(Some("runA")).count() == 2L)
    // ... WITHOUT writing anything: the legacy snapshot and marker are
    // untouched and no partition dirs appeared (a consumer with
    // read-only filesystem access must not fail).
    assert(fs.exists(new HPath(s"$ckRoot/$snapName")),
      "a pure read physically migrated the store")
    assert(fs.exists(new HPath(s"$ckRoot/_CURRENT")),
      "a pure read removed the legacy marker")
    assert(!fs.listStatus(new HPath(ckRoot)).exists(_.getPath.getName.startsWith("runId=")),
      "a pure read created partition dirs")
    // A write/maintenance entry point performs the physical migration:
    // rows land in per-run partitions, legacy snapshot + marker gone.
    store.saveCheckpoints(Seq(ck("a3", "runA", "b0", 3)))
    assert(store.checkpoints(Some("runA")).count() == 3L)
    assert(store.checkpoints(Some("runB")).count() == 1L)
    assert(store.checkpoints().count() == 4L)
    assert(!fs.exists(new HPath(s"$ckRoot/$snapName")), "legacy snapshot not reclaimed")
    assert(!fs.exists(new HPath(s"$ckRoot/_CURRENT")), "legacy marker not removed")
    assert(!fs.exists(new HPath(s"$ckRoot/_migrating")), "migration staging not cleaned up")
    // And the per-run maintenance paths work on the migrated rows.
    assert(store.cleanupCheckpoints("runA", keepLatest = 1) == 2L)
    assert(store.checkpoints().count() == 2L)
  }

  test("migration is idempotent under crash re-entry: staged rows partially appended never duplicate") {
    val (store, root) = freshStore("crashmig")
    val ckRoot = s"$root/${MemoryType.Checkpoints}"
    val fs = new HPath(ckRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    // Simulate a migration that crashed between the per-run append and
    // the staging cleanup: the legacy snapshot already RENAMED into
    // _migrating/, and runA's rows ALREADY appended to their partition.
    val legacyRows = Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("b1", "runB", "b0", 1))
    legacyRows.toDS().toDF().write
      .parquet(s"$ckRoot/_migrating/snap_000001_deadbeef")
    // pre-populate runA's partition with the same rows (the crashed
    // migration's partial progress)
    Seq(ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2)).toDS().toDF()
      .write.parquet(s"$ckRoot/runId=runA/snap_000001_cafe0001")
    val ok = fs.create(new HPath(s"$ckRoot/runId=runA/_CURRENT"), true)
    try ok.write("snap_000001_cafe0001".getBytes("UTF-8")) finally ok.close()
    // A read mid-migration already sees everything exactly once.
    assert(store.checkpoints().collect().map(_.id).sorted.toSeq == Seq("a1", "a2", "b1"),
      "mid-migration read lost or duplicated rows")
    // The write entry point resumes the drain — id-deduped, so the
    // already-appended runA rows do NOT double.
    store.saveCheckpoints(Seq(ck("c1", "runC", "b0", 1)))
    val ids = store.checkpoints().collect().map(_.id).sorted
    assert(ids.toSeq == Seq("a1", "a2", "b1", "c1"),
      s"crash re-entry duplicated or lost rows: ${ids.mkString(",")}")
    assert(!fs.exists(new HPath(s"$ckRoot/_migrating")), "staging not cleaned up after drain")
    // Re-running the whole migration path again stays a no-op.
    store.saveCheckpoints(Seq(ck("c2", "runC", "b0", 2)))
    assert(store.checkpoints().count() == 5L)
  }

  test("legacy null-runId rows are quarantined readable, not a permanent brick") {
    val (store, root) = freshStore("nulllegacy")
    // Schema built WITHOUT touching the store: a checkpoints() call on
    // the still-empty root would settle the per-instance layout check
    // before the test plants the legacy snapshot behind the store's
    // back (real stores never regress layouts; tests do).
    val sch = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.Encoders.product[Checkpoint].schema.map(_.copy(nullable = true)))
    val legacy = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("x1", null, "node", "b0", 1L, null, "{}",
          new Timestamp(1700000000000L)),
        org.apache.spark.sql.Row("a1", "runA", "node", "b0", 1L, null, "{}",
          new Timestamp(1700000000001L))),
      sch)
    val ckRoot = s"$root/${MemoryType.Checkpoints}"
    legacy.write.parquet(s"$ckRoot/snap_000001_deadbeef")
    val fs = new HPath(ckRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new HPath(s"$ckRoot/_CURRENT"), true)
    try out.write("snap_000001_deadbeef".getBytes("UTF-8")) finally out.close()
    // The bad row must not brick the store: migration quarantines it
    // (runId stays null IN the data) and every entry point keeps working.
    store.saveCheckpoints(Seq(ck("a2", "runA", "b0", 2)))
    val all = store.checkpoints().collect()
    assert(all.map(_.id).sorted.toSeq == Seq("a1", "a2", "x1"),
      "null-runId legacy row lost (or others dropped) in migration")
    assert(all.find(_.id == "x1").get.runId == null, "quarantined row's runId must stay null")
    // Run-scoped reads never see the quarantined row.
    assert(store.checkpoints(Some("runA")).count() == 2L)
    // New writes still reject null runIds loudly.
    val e = intercept[IllegalArgumentException] {
      store.appendRows(legacy.filter(org.apache.spark.sql.functions.col("runId").isNull),
        MemoryType.Checkpoints)
    }
    assert(e.getMessage.contains("runId"))
  }

  test("the migration layout check runs once per store instance (then short-circuits)") {
    val (store, _) = freshStore("migonce")
    store.saveCheckpoints(Seq(ck("a1", "runA", "b0", 1)))
    val after = store.ckMigrationChecks.get()
    assert(after >= 1L, "the first entry point must run the layout check")
    // Steady state: further entry points (writes, reads, maintenance)
    // must not re-pay the root listing — the check count stays frozen.
    store.saveCheckpoints(Seq(ck("a2", "runA", "b0", 2)))
    store.checkpoints().count()
    store.cleanupCheckpoints("runA", keepLatest = 10)
    store.compact(MemoryType.Checkpoints)
    assert(store.ckMigrationChecks.get() == after,
      s"migration check re-ran on a settled store: $after -> ${store.ckMigrationChecks.get()}")
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
