package graft.storage

import graft.SparkSpec
import graft.workflow.Checkpoint
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path => HPath, RawLocalFileSystem}

/** Test-only fault-injecting local filesystem, registered under the
  * `flaky://` scheme. Faults are driven by process-global substring
  * toggles (Hadoop instantiates and caches the filesystem
  * reflectively, so instance state can't be handed in):
  *
  *  - [[FlakyFs.failListOf]]: `listStatus` on a matching path throws a
  *    plain (non-FileNotFound) IOException — a transient listing
  *    failure.
  *  - [[FlakyFs.failOpenOf]]: `open` on a matching path throws.
  *  - [[FlakyFs.renameFailOf]]: `rename` FROM a matching source
  *    returns false without moving anything — the legal "rename
  *    failed" signal many object-store adapters use instead of
  *    throwing.
  *  - [[FlakyFs.renameFailIfDstExistsOf]]: `rename` TO a matching
  *    destination returns false iff the destination already exists —
  *    the object-store "destination occupied" refusal, which
  *    self-heals once the blocker is deleted.
  *  - [[FlakyFs.failDeleteOf]]: `delete` of a matching path throws a
  *    plain IOException — a transient delete failure.
  *
  * Scoping contract: the toggles are process-global (and Hadoop caches
  * the FileSystem instance process-wide), so every match string MUST
  * embed the test's unique root tag (`graft_mfault_<tag>`) — a bare
  * substring would bleed faults into unrelated suites if ScalaTest
  * ever ran them in parallel in one JVM. Fault-injecting test bodies
  * additionally run under [[FlakyFs.locked]], which serializes them on
  * the companion: the build currently runs suites serially, but the
  * lock makes the assumption enforced rather than ambient.
  */
class FlakyFs extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")

  private def matches(toggle: String, p: HPath): Boolean =
    toggle != null && p.toString.contains(toggle)

  override def listStatus(f: HPath): Array[FileStatus] = {
    if (matches(FlakyFs.failListOf, f))
      throw new java.io.IOException(s"injected transient listing failure: $f")
    super.listStatus(f)
  }

  override def open(f: HPath, bufferSize: Int): FSDataInputStream = {
    if (matches(FlakyFs.failOpenOf, f))
      throw new java.io.IOException(s"injected transient open failure: $f")
    super.open(f, bufferSize)
  }

  override def rename(src: HPath, dst: HPath): Boolean = {
    if (matches(FlakyFs.renameFailOf, src)) false
    else if (matches(FlakyFs.renameFailIfDstExistsOf, dst) && exists(dst)) false
    else super.rename(src, dst)
  }

  override def delete(f: HPath, recursive: Boolean): Boolean = {
    if (matches(FlakyFs.failDeleteOf, f))
      throw new java.io.IOException(s"injected transient delete failure: $f")
    super.delete(f, recursive)
  }
}

object FlakyFs {
  @volatile var failListOf: String = null
  @volatile var failOpenOf: String = null
  @volatile var renameFailOf: String = null
  @volatile var renameFailIfDstExistsOf: String = null
  @volatile var failDeleteOf: String = null
  def clear(): Unit = {
    failListOf = null; failOpenOf = null; renameFailOf = null
    renameFailIfDstExistsOf = null; failDeleteOf = null
  }

  /** Serializes fault-injecting test bodies on this companion — the
    * toggles are process-global, so two suites injecting faults in
    * parallel (one JVM) would bleed into each other. Always clears on
    * the way out, even when the body already cleared.
    */
  def locked[A](body: => A): A = synchronized { try body finally clear() }
}

/** FileContext-side binding for `flaky://` (the store's marker commits
  * go through FileContext, which resolves AbstractFileSystem, not
  * FileSystem). Pure delegation — the faults live in [[FlakyFs]].
  */
class FlakyAbstractFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(uri, new FlakyFs, conf, "flaky", false)

/** The legacy-checkpoint migration under filesystem FAULTS — the cases
  * a clean local run never exercises:
  *
  *  1. a transient listing/open failure must not latch the
  *     per-instance "settled" flag (an error-masked empty is not an
  *     observation — the next fault-free read must still see the
  *     legacy rows);
  *  2. a failed Phase-1 claim rename must leave the root `_CURRENT`
  *     marker in place, so a `_SUCCESS`-less legacy snapshot (which
  *     the listing fallback cannot re-detect) stays discoverable;
  *  3. a three-way mid-migration overlap — the same checkpoint id in a
  *     per-run partition AND staging AND the root legacy snapshot —
  *     reads exactly once and drains without duplicates.
  */
class MigrationFaultSpec extends SparkSpec {

  import CheckpointFixtures.ck

  private def writeLegacy(root: String, rows: Seq[Checkpoint],
      snapName: String = "snap_000001_deadbeef"): String =
    CheckpointFixtures.writeLegacy(spark, root, rows, snapName)

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def freshRoot(tag: String, scheme: Option[String] = None): String = {
    hconf.set("fs.flaky.impl", classOf[FlakyFs].getName)
    hconf.set("fs.AbstractFileSystem.flaky.impl", classOf[FlakyAbstractFs].getName)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mfault_$tag"
    val p = new HPath(base)
    val fs = p.getFileSystem(hconf)
    if (fs.exists(p)) fs.delete(p, true)
    scheme.map(s => s"$s://$base").getOrElse(base)
  }

  test("a transient listing failure does not latch 'settled' — the next read still sees legacy rows") {
    val root = freshRoot("latch", scheme = Some("flaky"))
    writeLegacy(root, Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("b1", "runB", "b0", 1)))
    val store = new MemoryStore(spark, root)
    FlakyFs.locked {
      // Fault window: the marker read and the checkpoints-root listing
      // both fail with a plain IOException. Every legacy probe is now
      // error-masked — the read may legitimately come up short, but it
      // must NOT conclude "no legacy rows, ever again".
      FlakyFs.failOpenOf = s"graft_mfault_latch/${MemoryType.Checkpoints}/_CURRENT"
      FlakyFs.failListOf = s"graft_mfault_latch/${MemoryType.Checkpoints}"
      val duringFault = store.checkpoints().count()
      assert(duringFault == 0L,
        s"fault window should read empty (probes masked), got $duringFault")
      // Fault clears; the SAME instance must now see the legacy rows.
      // (Before the probed-emptiness fix, legacyPendingRows latched
      // ckMigrationSettled on the masked empty and this read stayed 0.)
      FlakyFs.clear()
      val after = store.checkpoints().collect().map(_.id).sorted
      assert(after.toSeq == Seq("a1", "a2", "b1"),
        s"transient listing failure hid legacy rows for the instance lifetime: ${after.mkString(",")}")
      // And the write entry points migrate normally afterwards.
      store.saveCheckpoints(Seq(ck("c1", "runC", "b0", 1)))
      assert(store.checkpoints().count() == 4L)
    }
  }

  test("a failed claim rename keeps the marker — a _SUCCESS-less legacy snapshot stays discoverable") {
    val root = freshRoot("rename", scheme = Some("flaky"))
    val snapName = "snap_000001_deadbeef"
    val ckRoot = writeLegacy(root, Seq(
      ck("a1", "runA", "b0", 1), ck("b1", "runB", "b0", 1)), snapName)
    val fs = new HPath(ckRoot).getFileSystem(hconf)
    // The worst-case legacy snapshot: no _SUCCESS file, so only the
    // marker can re-detect it.
    fs.delete(new HPath(s"$ckRoot/$snapName/_SUCCESS"), false)
    val store = new MemoryStore(spark, root)
    FlakyFs.locked {
      FlakyFs.renameFailOf = s"graft_mfault_rename/${MemoryType.Checkpoints}/$snapName"
      // A write entry point attempts the migration; the claim rename
      // fails. The marker must survive (deleting it would make the
      // _SUCCESS-less snapshot invisible forever) and no data may be
      // lost meanwhile.
      store.saveCheckpoints(Seq(ck("c1", "runC", "b0", 1)))
      assert(fs.exists(new HPath(s"$ckRoot/_CURRENT")),
        "failed claim rename must leave the legacy marker in place")
      assert(fs.exists(new HPath(s"$ckRoot/$snapName")), "legacy snapshot vanished")
      val mid = store.checkpoints().collect().map(_.id).sorted
      assert(mid.toSeq == Seq("a1", "b1", "c1"),
        s"rows lost while the claim keeps failing: ${mid.mkString(",")}")
      // Fault clears; the next entry point completes the migration.
      FlakyFs.clear()
      store.saveCheckpoints(Seq(ck("c2", "runC", "b0", 2)))
      val ids = store.checkpoints().collect().map(_.id).sorted
      assert(ids.toSeq == Seq("a1", "b1", "c1", "c2"),
        s"retried migration lost or duplicated rows: ${ids.mkString(",")}")
      assert(!fs.exists(new HPath(s"$ckRoot/_CURRENT")), "marker not removed after successful claim")
      assert(!fs.exists(new HPath(s"$ckRoot/$snapName")), "legacy snapshot not reclaimed")
      assert(!fs.exists(new HPath(s"$ckRoot/_migrating")), "staging not cleaned up")
    }
  }

  test("a same-named staged sibling blocking the claim settles in ONE entry point") {
    // A crashed object-store copy+delete can leave the legacy snapshot
    // in BOTH places: staged under `_migrating/<name>` AND still at the
    // root. The claim rename then fails because the staging DESTINATION
    // is occupied — Phase 2 drains and deletes staging, and the claim
    // is retried once within the same call, so a single entry point
    // fully settles the store instead of deferring to the next one.
    import spark.implicits._
    val root = freshRoot("dstbusy", scheme = Some("flaky"))
    val snapName = "snap_000001_deadbeef"
    val ckRoot = writeLegacy(root, Seq(
      ck("a1", "runA", "b0", 1), ck("b1", "runB", "b0", 1)), snapName)
    // The staged sibling carries the same rows (a copy+delete crashed
    // after the copy) — identical ids, deduped on drain.
    Seq(ck("a1", "runA", "b0", 1), ck("b1", "runB", "b0", 1)).toDS().toDF()
      .write.parquet(s"$ckRoot/_migrating/$snapName")
    val fs = new HPath(ckRoot).getFileSystem(hconf)
    val store = new MemoryStore(spark, root)
    FlakyFs.locked {
      // Model the object-store refusal deterministically: rename TO the
      // staged path returns false while the destination exists, and
      // succeeds once the drain removed it.
      FlakyFs.renameFailIfDstExistsOf =
        s"graft_mfault_dstbusy/${MemoryType.Checkpoints}/_migrating/$snapName"
      store.saveCheckpoints(Seq(ck("c1", "runC", "b0", 1)))
      val ids = store.checkpoints().collect().map(_.id).sorted
      assert(ids.toSeq == Seq("a1", "b1", "c1"),
        s"drain through the blocked claim lost or duplicated rows: ${ids.mkString(",")}")
      assert(!fs.exists(new HPath(s"$ckRoot/$snapName")),
        "root legacy snapshot must be reclaimed by the SAME entry point once the drain unblocked the claim")
      assert(!fs.exists(new HPath(s"$ckRoot/_migrating")), "staging not cleaned up")
      assert(!fs.exists(new HPath(s"$ckRoot/_CURRENT")), "root marker not removed")
      // The settled latch must have closed in that single migration
      // check: a second write entry point performs no further checks.
      val checksAfterFirst = store.ckMigrationChecks.get()
      store.saveCheckpoints(Seq(ck("c2", "runC", "b0", 2)))
      assert(store.ckMigrationChecks.get() == checksAfterFirst,
        "store did not settle within the single blocked-claim entry point")
      val all = store.checkpoints().collect().map(_.id).sorted
      assert(all.toSeq == Seq("a1", "b1", "c1", "c2"))
    }
  }

  test("a failed marker delete after a successful claim leaves a harmless dangling marker") {
    // The claim's marker delete is best-effort (the snapshot is already
    // safely in staging); a transient failure leaves a root `_CURRENT`
    // naming a directory that no longer exists. The documented contract:
    // snapshot resolution treats a marker naming a vanished dir as
    // corrupt and falls to the listing, so the dangling marker must
    // neither resurrect the legacy snapshot, block settling, nor
    // confuse a FRESH store instance later.
    val root = freshRoot("marker", scheme = Some("flaky"))
    val snapName = "snap_000001_deadbeef"
    val ckRoot = writeLegacy(root, Seq(
      ck("a1", "runA", "b0", 1), ck("b1", "runB", "b0", 1)), snapName)
    val fs = new HPath(ckRoot).getFileSystem(hconf)
    val store = new MemoryStore(spark, root)
    FlakyFs.locked {
      FlakyFs.failDeleteOf = s"graft_mfault_marker/${MemoryType.Checkpoints}/_CURRENT"
      store.saveCheckpoints(Seq(ck("c1", "runC", "b0", 1)))
      // Claim + drain completed; only the marker delete failed.
      assert(!fs.exists(new HPath(s"$ckRoot/$snapName")), "legacy snapshot not reclaimed")
      assert(!fs.exists(new HPath(s"$ckRoot/_migrating")), "staging not cleaned up")
      assert(fs.exists(new HPath(s"$ckRoot/_CURRENT")),
        "test premise: the injected fault should have kept the marker")
      val ids = store.checkpoints().collect().map(_.id).sorted
      assert(ids.toSeq == Seq("a1", "b1", "c1"),
        s"dangling marker perturbed the drained rows: ${ids.mkString(",")}")
      // The dangling marker must not re-arm detection: the store
      // settles despite it (marker → vanished dir → corrupt → listing
      // fallback finds nothing), so further entry points skip the check.
      val checksAfterFirst = store.ckMigrationChecks.get()
      store.saveCheckpoints(Seq(ck("c2", "runC", "b0", 2)))
      assert(store.ckMigrationChecks.get() == checksAfterFirst,
        "dangling marker kept the migration check re-arming")
    }
    // Fault cleared — a FRESH instance (new process, in spirit) must
    // read the same rows and settle on its first entry point too.
    val fresh = new MemoryStore(spark, root)
    val all = fresh.checkpoints().collect().map(_.id).sorted
    assert(all.toSeq == Seq("a1", "b1", "c1", "c2"),
      s"fresh instance misread under the dangling marker: ${all.mkString(",")}")
    fresh.saveCheckpoints(Seq(ck("c3", "runC", "b0", 3)))
    val checks = fresh.ckMigrationChecks.get()
    fresh.saveCheckpoints(Seq(ck("c4", "runC", "b0", 4)))
    assert(fresh.ckMigrationChecks.get() == checks,
      "fresh instance did not settle under the dangling marker")
    assert(fresh.checkpoints().count() == 6L)
  }

  test("three-way overlap (partition + staging + root legacy) reads once and drains without duplicates") {
    import spark.implicits._
    val root = freshRoot("overlap")
    val ckRoot = s"$root/${MemoryType.Checkpoints}"
    val fs = new HPath(ckRoot).getFileSystem(hconf)
    // An older migration claimed-and-crashed (staging holds a1,b1 and
    // runA's partition already has a1), then a stale writer re-created
    // a root legacy snapshot holding a1,a2,b1 — every id now exists in
    // up to three places.
    Seq(ck("a1", "runA", "b0", 1), ck("b1", "runB", "b0", 1)).toDS().toDF()
      .write.parquet(s"$ckRoot/_migrating/snap_000000_cafe0000")
    Seq(ck("a1", "runA", "b0", 1)).toDS().toDF()
      .write.parquet(s"$ckRoot/runId=runA/snap_000001_cafe0001")
    val mk = fs.create(new HPath(s"$ckRoot/runId=runA/_CURRENT"), true)
    try mk.write("snap_000001_cafe0001".getBytes("UTF-8")) finally mk.close()
    writeLegacy(root, Seq(
      ck("a1", "runA", "b0", 1), ck("a2", "runA", "b0", 2),
      ck("b1", "runB", "b0", 1)))
    val store = new MemoryStore(spark, root)
    // Pure read: each id exactly once, across all three sources.
    val got = store.checkpoints().collect().map(_.id).sorted
    assert(got.toSeq == Seq("a1", "a2", "b1"),
      s"three-source union lost or duplicated rows: ${got.mkString(",")}")
    val runA = store.checkpoints(Some("runA")).collect().map(_.id).sorted
    assert(runA.toSeq == Seq("a1", "a2"),
      s"run-scoped three-source read wrong: ${runA.mkString(",")}")
    // A write entry point drains everything — still no duplicates, and
    // all legacy layout gone.
    store.saveCheckpoints(Seq(ck("c1", "runC", "b0", 1)))
    val ids = store.checkpoints().collect().map(_.id).sorted
    assert(ids.toSeq == Seq("a1", "a2", "b1", "c1"),
      s"drain duplicated or lost rows: ${ids.mkString(",")}")
    assert(!fs.exists(new HPath(s"$ckRoot/_migrating")), "staging not cleaned up")
    assert(!fs.exists(new HPath(s"$ckRoot/_CURRENT")), "root marker not removed")
    assert(!fs.listStatus(new HPath(ckRoot)).exists(_.getPath.getName.startsWith("snap_")),
      "root legacy snapshot not reclaimed")
  }
}
