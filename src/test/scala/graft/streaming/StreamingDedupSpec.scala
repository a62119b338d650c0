package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.io.Tables
import graft.operators.TextAnalysisShared
import graft.streaming.StreamingLearn.DocEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("per-row stateless signatures match the batch groupBy signatures exactly") {
    val docs = Tables.documents(spark, Sf).limit(100)
    val batch = TextAnalysisShared.bandedMinhashSigs(docs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perRow = docs
      .select(col("doc_id"), explode(StreamingDedup.rowSigs(col("text"), 4)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(perRow == batch,
      s"stateless sigs diverge: only-row=${perRow -- batch} only-batch=${batch -- perRow}")
  }

  test("short documents (< 3 tokens) produce no signatures in either form") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val rows = tiny.select(col("doc_id"), explode(StreamingDedup.rowSigs(col("text"), 4)))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(rows == Set(2L), "only the 4-token doc signs")
  }

  test("stream-static probe emits exactly the batch incremental vs-index candidates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    // Index = non-batch docs; the "stream" carries the batch docs.
    val indexSigs = TextAnalysisShared.bandedMinhashSigs(
      docs.filter(col("doc_id") % 5 =!= 0), 4)
    val streamDocs = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").collect()
      .map(r => DocEvent(r.getLong(0), r.getString(1), ts("2024-01-01 10:00:00")))
    val input = MemoryStream[DocEvent]
    val query = StreamingDedup.candidatesVsIndex(input.toDS(), indexSigs)
      .writeStream.format("memory").queryName("sd_cand").start()
    try {
      input.addData(streamDocs.toIndexedSeq)
      query.processAllAvailable()
      val got = spark.table("sd_cand")
        .groupBy("doc_new", "doc_other").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = graft.SparkEntry.queries("q_dedup_incremental")(spark, Sf)
        .filter(col("origin") === "index")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(got == expected,
        s"stream candidates != batch vs-index: only-stream=${got.keySet -- expected.keySet} " +
          s"only-batch=${expected.keySet -- got.keySet}")
    } finally query.stop()
  }

  test("self-growing dedup drops later near-duplicates and indexes novel docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val input = MemoryStream[DocEvent]
    val query = StreamingDedup.runSelfGrowingDedup(
      input.toDS(), s"$dir/index", s"$dir/novel", s"$dir/ckpt")
    val docA = "alpha beta gamma delta epsilon zeta eta theta"
    val docB = "one two three four five six seven eight nine"
    val docC = "red orange yellow green blue indigo violet ultraviolet"
    try {
      input.addData(DocEvent(1L, docA, ts("2024-01-01 10:00:00")),
        DocEvent(2L, docB, ts("2024-01-01 10:00:01")))
      query.processAllAvailable()
      // Batch 2: doc 3 duplicates doc 1's content (new id), doc 4 novel.
      input.addData(DocEvent(3L, docA, ts("2024-01-01 10:01:00")),
        DocEvent(4L, docC, ts("2024-01-01 10:01:01")))
      query.processAllAvailable()
      val novel = spark.read.parquet(s"$dir/novel")
        .select("doc_id").as[Long].collect().toSet
      assert(novel == Set(1L, 2L, 4L), s"dup doc 3 must be dropped, got $novel")
      val indexed = spark.read.parquet(s"$dir/index")
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(indexed == Set(1L, 2L, 4L), s"index must hold exactly the novel docs, got $indexed")
    } finally query.stop()
  }

  test("two copies arriving in ONE micro-batch keep only the first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-withinbatch").toString
    val batch = Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta", ts("2024-01-01 10:00:00")),
      (21L, "alpha beta gamma delta epsilon zeta eta theta", ts("2024-01-01 10:00:01")),
      (22L, "one two three four five six seven eight nine", ts("2024-01-01 10:00:02")))
      .toDF("doc_id", "text", "ts")
    StreamingDedup.processBatch(batch, 0L, s"$dir/index", s"$dir/novel")
    val novel = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(novel == Set(20L, 22L), s"within-batch dup 21 must be dropped: $novel")
    val indexed = spark.read.parquet(s"$dir/index")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == Set(20L, 22L), s"dropped docs must not be indexed: $indexed")
  }

  test("AND-amplification: a 1-band collision is kept, a >=2-band collision is dropped") {
    import spark.implicits._
    // Pull REAL pairs from the corpus at each evidence level, so the
    // threshold is exercised against genuine minhash behavior rather
    // than hand-made exact copies (which trivially match 4/4 bands).
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    val sigs = TextAnalysisShared.bandedMinhashSigs(docs, 4)
    val pairs = sigs.as("a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("doc_id") < col("doc_b"))
      .groupBy("doc_id", "doc_b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val oneBand = pairs.find(_._3 == 1).getOrElse(fail("corpus has no 1-band pair"))
    val multiBand = pairs.find(_._3 >= 2).getOrElse(fail("corpus has no >=2-band pair"))
    val text = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def verdict(pair: (Long, Long, Long)): Set[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("stream-bands").toString
      def df(id: Long) = Seq((id, text(id), ts("2024-01-01 10:00:00"))).toDF("doc_id", "text", "ts")
      StreamingDedup.processBatch(df(pair._1), 0L, s"$dir/index", s"$dir/novel")
      StreamingDedup.processBatch(df(pair._2), 1L, s"$dir/index", s"$dir/novel")
      spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    }
    assert(verdict(oneBand) == Set(oneBand._1, oneBand._2),
      s"1-band pair $oneBand is chance-level evidence and must be KEPT")
    assert(verdict(multiBand) == Set(multiBand._1),
      s">=2-band pair $multiBand is a near-dup and the later doc must be dropped")
    intercept[IllegalArgumentException] {
      StreamingDedup.processBatch(docs.limit(1).withColumn("ts", lit(ts("2024-01-01 10:00:00"))),
        9L, "/tmp/never", "/tmp/never2", minBands = 5)
    }
  }

  test("verify mode keeps a band-colliding non-duplicate and still drops true duplicates") {
    import spark.implicits._
    // Construct a REAL band false positive: a shared 16-token core whose
    // shingles can win the per-band minima, plus 25-token unique tails
    // that keep token-set Jaccard at ~16/66 ≈ 0.24 — far below τ = 0.5.
    // Which pairs collide on ≥ 2 bands depends on the hash draws, so
    // search 100 constructed pairs in one job and use the first hit.
    val core = (1 to 16).map(k => s"core$k").mkString(" ")
    def doc(side: Char, i: Int) =
      s"$core " + (1 to 25).map(k => s"$side${i}x$k").mkString(" ")
    val cand = (0 until 100).flatMap(i =>
      Seq((1000L + i, doc('a', i)), (2000L + i, doc('b', i)))).toDF("doc_id", "text")
    val sigs = TextAnalysisShared.bandedMinhashSigs(cand, 4)
    val hits = sigs
      .join(sigs.select(col("doc_id").as("doc_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("doc_b") === col("doc_id") + 1000)
      .groupBy("doc_id").agg(countDistinct("band").as("nb"))
      .filter(col("nb") >= 2)
      .select("doc_id").as[Long].collect()
    assert(hits.nonEmpty, "no constructed 2-band collider found; widen the search")
    val i = (hits.min - 1000).toInt
    val (aId, aText) = (1000L + i, doc('a', i))
    val (bId, bText) = (2000L + i, doc('b', i))
    val jac = {
      val (sa, sb) = (aText.split(" ").toSet, bText.split(" ").toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    assert(jac < 0.5, s"collider pair must be genuinely dissimilar, jaccard=$jac")
    def run(verify: Option[Double]): Set[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("stream-verify").toString
      def df(id: Long, text: String) =
        Seq((id, text, ts("2024-01-01 10:00:00"))).toDF("doc_id", "text", "ts")
      StreamingDedup.processBatch(df(aId, aText), 0L, s"$dir/index", s"$dir/novel",
        verifyJaccard = verify)
      StreamingDedup.processBatch(df(bId, bText), 1L, s"$dir/index", s"$dir/novel",
        verifyJaccard = verify)
      spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    }
    assert(run(None) == Set(aId),
      "band-only mode must drop the collider (the false positive this leg exists for)")
    assert(run(Some(0.5)) == Set(aId, bId),
      "verify mode must keep the low-Jaccard band collider")
    // True duplicates still drop in verify mode — both legs: a copy in
    // the SAME batch (within-batch leg) and a later copy (index leg,
    // confirmed against text re-read from the novel output).
    val dir = java.nio.file.Files.createTempDirectory("stream-verify-dup").toString
    val twin = Seq((50L, aText, ts("2024-01-01 10:00:00")),
      (51L, aText, ts("2024-01-01 10:00:01"))).toDF("doc_id", "text", "ts")
    StreamingDedup.processBatch(twin, 0L, s"$dir/index", s"$dir/novel",
      verifyJaccard = Some(0.5))
    val afterTwin = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(afterTwin == Set(50L), s"within-batch true dup must drop in verify mode: $afterTwin")
    val later = Seq((52L, aText, ts("2024-01-01 10:05:00"))).toDF("doc_id", "text", "ts")
    StreamingDedup.processBatch(later, 1L, s"$dir/index", s"$dir/novel",
      verifyJaccard = Some(0.5))
    val afterLater = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(afterLater == Set(50L), s"vs-index true dup must drop in verify mode: $afterLater")
    intercept[IllegalArgumentException] {
      StreamingDedup.processBatch(twin, 9L, "/tmp/never3", "/tmp/never4",
        verifyJaccard = Some(1.5))
    }
  }

  test("a replayed micro-batch reproduces its novel set instead of rewriting it empty") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-replay").toString
    // Includes a within-batch duplicate pair (10, 13): on replay, doc
    // 10's own first-run signatures sit in the index AND collide with
    // 13 — the verdicts must still come out exactly as in the first run.
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta", ts("2024-01-01 10:00:00")),
      (11L, "one two three four five six seven eight nine", ts("2024-01-01 10:00:01")),
      (13L, "alpha beta gamma delta epsilon zeta eta theta", ts("2024-01-01 10:00:02")))
      .toDF("doc_id", "text", "ts")
    StreamingDedup.processBatch(batch, 0L, s"$dir/index", s"$dir/novel")
    val first = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(first == Set(10L, 11L), s"within-batch dup 13 must be dropped: $first")
    val firstIndexRows = spark.read.parquet(s"$dir/index").count()
    // Crash-after-index-write, restart, replay of the SAME batch: the
    // docs' own signatures are already indexed, and must not make the
    // replay classify them as duplicates.
    StreamingDedup.processBatch(batch, 0L, s"$dir/index", s"$dir/novel")
    val replayed = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(replayed == Set(10L, 11L), s"replay changed the novel set: $replayed")
    // The signature write overwrites its own batch_id partition, so a
    // replay must not grow the index either.
    val replayedIndexRows = spark.read.parquet(s"$dir/index").count()
    assert(replayedIndexRows == firstIndexRows,
      s"replay grew the index: $firstIndexRows -> $replayedIndexRows rows")
    // And a LATER batch still sees them as duplicates (dedup verdicts
    // unchanged by the doubled signature rows).
    val later = Seq((12L, "alpha beta gamma delta epsilon zeta eta theta",
      ts("2024-01-01 10:05:00"))).toDF("doc_id", "text", "ts")
    StreamingDedup.processBatch(later, 1L, s"$dir/index", s"$dir/novel")
    val afterLater = spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet
    assert(afterLater == Set(10L, 11L), s"near-dup doc 12 must be dropped: $afterLater")
  }
}
