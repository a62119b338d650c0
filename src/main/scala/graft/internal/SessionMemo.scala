package graft.internal

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(session, table-state) memo of an expensive derived frame —
  * the one discipline behind the sig/LM session caches
  * ([[graft.operators.Dedup]], [[graft.operators.Curation]]): within a
  * session the first consumer of a shared chain pays the build
  * (typically a `localCheckpoint(true)`) and later consumers re-read
  * the materialized blocks.
  *
  * Three properties the ad-hoc per-file WeakHashMaps did NOT have:
  *
  *  - '''Mutation invalidation.''' The cache key folds in a fingerprint
  *    of the table directory's file listing (file count plus per-file
  *    name, length, mtime AND a head/tail content sample, via the
  *    Hadoop FileSystem, so it works on HDFS/S3 paths too). A
  *    rewritten table misses naturally — no reliance on the opt-out
  *    conf — and the superseded entry for the same path is evicted so
  *    its checkpoint blocks can be unpersisted by GC/ContextCleaner.
  *  - '''Eviction for stopped sessions.''' The memoized DataFrames
  *    strongly reference their SparkSession, so a WeakHashMap keyed on
  *    the session alone never collects (the value pins the key). Every
  *    access purges entries whose SparkContext has stopped; their
  *    checkpoint blocks died with the context, this just frees the
  *    driver-side plans.
  *  - '''Attribution.''' Builds run under a
  *    [[graft.observability.Metrics.withOp]] label, so an op-metrics
  *    sink charges the shared chain to its builder (the same contract
  *    as `pair_guard_census`) instead of silently folding it into
  *    whichever query happened to run first.
  *
  * The opt-out conf (`confKey=false`) bypasses the memo entirely —
  * every call rebuilds, unlabeled, inside the consuming query — which
  * is what per-query standalone-cost benchmarking wants.
  */
private[graft] final class SessionMemo[V](confKey: String, opLabel: String) {

  private val cache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, V]]()

  /** FNV-1a 64 over the recursive listing: file count, then per file
    * (name, length, mtime) PLUS a bounded content sample — the first 16
    * and last 64 bytes. (name, length, mtime) alone aliases a
    * same-length in-place rewrite that lands within the filesystem's
    * mtime granularity (1 s on many stores) to the SAME key, silently
    * serving a stale frame. The tail sample closes that for the format
    * that matters here: a Parquet rewrite with different content almost
    * always differs in its footer (column stats / metadata live there —
    * the sampled 64-byte tail covers the footer-length + magic region),
    * and the head catches raw-file edits.
    *
    * Cost is bounded STRUCTURALLY, not by convention: (name, length,
    * mtime) is folded for EVERY file (from the listing alone — no
    * extra I/O), but content is sampled only for the first and last
    * [[SessionMemo.SampleFiles]] files in path order — at most 32
    * opens + 64 positioned reads per fingerprint no matter how many
    * parts the table has, so a future caller memoizing a
    * many-hundred-part table on an object store pays a constant number
    * of GETs, never one per part. A same-length/same-mtime byte
    * rewrite of an UNSAMPLED middle file can alias (accepted residual
    * — it requires forging mtime to sub-granularity AND preserving
    * length on a file the sort order hides); any length, mtime, name
    * or count change anywhere still misses. Files are visited in
    * path-sorted order so the sampled set — and the whole fingerprint —
    * is stable against filesystem listing-order variance. A file that
    * cannot be sampled (raced delete) mixes a sentinel, so the
    * fingerprint still changes when the listing does.
    */
  private def fingerprint(s: SparkSession, tablePath: String): String = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    var h = 0xcbf29ce484222325L
    def mix(x: Long): Unit = {
      var i = 0
      while (i < 8) { h ^= (x >>> (i * 8)) & 0xff; h *= 0x100000001b3L; i += 1 }
    }
    val listed = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) listed += it.next()
    }
    val sorted = listed.sortBy(_.getPath.toString)
    val n = sorted.length
    var sampled = 0
    var i = 0
    while (i < n) {
      val st = sorted(i)
      mix(st.getPath.getName.hashCode.toLong)
      mix(st.getLen)
      mix(st.getModificationTime)
      if (i < SessionMemo.SampleFiles || i >= n - SessionMemo.SampleFiles) {
        sampled += 1
        try {
          val in = fs.open(st.getPath)
          try {
            val head = new Array[Byte](math.min(16L, st.getLen).toInt)
            in.readFully(0L, head)
            head.foreach(b => mix(b.toLong))
            if (st.getLen > head.length) {
              val tailLen = math.min(64L, st.getLen - head.length).toInt
              val tail = new Array[Byte](tailLen)
              in.readFully(st.getLen - tailLen, tail)
              tail.foreach(b => mix(b.toLong))
            }
          } finally in.close()
        } catch { case _: java.io.IOException => mix(-1L) }
      }
      i += 1
    }
    SessionMemo.lastSampledFiles = sampled
    mix(n.toLong)
    java.lang.Long.toHexString(h)
  }

  def getOrBuild(s: SparkSession, tablePath: String)(build: => V): V = {
    if (!s.conf.get(confKey, "true").toBoolean) return build
    val perSession = cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = cache.get(s)
      if (m == null) { m = new ConcurrentHashMap[String, V](); cache.put(s, m) }
      m
    }
    val key = tablePath + "#" + fingerprint(s, tablePath)
    val hit = perSession.get(key)
    if (hit != null) return hit
    // A changed fingerprint supersedes any prior entry for this path;
    // drop the stale key before (re)building so the map stays one
    // entry per live table state.
    val stale = perSession.keys()
    while (stale.hasMoreElements) {
      val k = stale.nextElement()
      if (k.startsWith(tablePath + "#") && k != key) perSession.remove(k)
    }
    perSession.computeIfAbsent(key,
      _ => graft.observability.Metrics.withOp(s, opLabel)(build))
  }
}

private[graft] object SessionMemo {
  /** Content-sample at most this many files from each end of the
    * path-sorted listing per fingerprint — the structural cap on the
    * fingerprint's I/O (≤ 2·SampleFiles opens regardless of part
    * count). 16 covers every memoized table in the repo completely
    * (few-file checkpoint outputs) while bounding the object-store
    * worst case.
    */
  val SampleFiles = 16

  /** Observability/spec hook: how many files the LAST fingerprint pass
    * content-sampled (SessionMemoSpec pins the ≤ 2·SampleFiles bound on
    * a many-file table).
    */
  @volatile private[graft] var lastSampledFiles: Int = 0
}
