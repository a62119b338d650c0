package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Pipeline-prep pack invariants the DuckDB oracle cannot see: the
  * hash sampler must be a pure function of the key (membership
  * identical under any physical partitioning — the property Spark's
  * own sample() lacks), and sequence packs must tile each language
  * stream without overlap or token loss.
  */
class PipelinePrepSpec extends SparkSpec {

  private val bucketExpr =
    expr("cast(conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 15), 16, 10) as bigint) % 100")

  test("corpus card dup accounting matches the exact-dedup groups") {
    // The card's dup_docs (docs whose fp occurs > 1 time corpus-wide)
    // must total exactly the membership of q_dedup_exact's multi-doc
    // groups — the two queries share the fingerprint definition.
    val card = graft.SparkEntry.queries("q_corpus_card")(spark, Sf)
    val dupTotal = card.agg(sum("dup_docs")).head().getLong(0)
    val nTotal = card.agg(sum("n_docs")).head().getLong(0)
    val exact = graft.SparkEntry.queries("q_dedup_exact")(spark, Sf)
    val wantDup = exact.filter(col("cnt") > 1).agg(coalesce(sum("cnt"), lit(0L)))
      .head().getLong(0)
    val wantN = exact.agg(sum("cnt")).head().getLong(0)
    assert(dupTotal == wantDup, s"card dup_docs $dupTotal != exact-dedup $wantDup")
    assert(nTotal == wantN, s"card n_docs $nTotal != corpus $wantN")
  }

  test("stratified-sample bucket is partition-invariant") {
    val docs = Tables.documents(spark, Sf)
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), bucketExpr.as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = buckets(docs)
    val shuffled = buckets(docs.repartition(7))
    assert(base == shuffled, "hash bucket changed with physical partitioning")
    // And the keep decision is a real downsample, not all-or-nothing.
    val kept = SparkEntry.queries("q_stratified_sample")(spark, Sf).count()
    assert(kept > 0 && kept < docs.count())
  }

  test("mixture resample: copy counts bounded by the integer rate, direction correct") {
    val docs = Tables.documents(spark, Sf)
    val langN = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q_mixture_resample")(spark, Sf)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("rate_pct"))))
    val copies = out.groupBy(_._2).map { case (l, rs) => l -> rs.length.toLong }
    val rate = out.groupBy(_._2).map { case (l, rs) => l -> rs.head._3 }
    rate.foreach { case (lang, pct) =>
      val n = langN(lang)
      // Whole epochs are exact; the fractional epoch is hash-selected,
      // so per-lang output sits between floor and ceil of rate·n.
      val lo = (pct / 100) * n
      val hi = lo + (if (pct % 100 == 0) 0L else n)
      assert(copies(lang) >= lo && copies(lang) <= hi,
        s"$lang: ${copies(lang)} copies outside [$lo,$hi] at rate $pct%")
    }
    // The mixture moves the right direction: en (over-represented vs
    // its 30% target) sheds rows; no doc appears more often than its
    // lang's ceil(rate) epochs.
    assert(copies("en") < langN("en"), "en was not downsampled")
    val perDoc = out.groupBy(_._1).map(_._2.length)
    assert(perDoc.max <= rate.values.map(p => p / 100 + 1).max.toInt)
  }

  test("train split is stable under corpus growth and partitions exactly") {
    val docs = Tables.documents(spark, Sf)
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] = df
      .select(col("doc_id"), expr(
        "cast(conv(substring(md5(cast(concat('split', cast(doc_id as string)) as binary)), 1, 15), 16, 10) as bigint) % 1000").as("b"))
      .withColumn("split", when(col("b") < 900, "train")
        .when(col("b") < 950, "val").otherwise("test"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = assign(docs)
    // Growth-stability: assigning over HALF the corpus gives every
    // surviving doc the same split — membership is a function of the
    // id alone, never of what else is in the table.
    val half = assign(docs.filter(col("doc_id") % 2 === 0))
    half.foreach { case (id, s) => assert(full(id) == s, s"doc $id switched split") }
    // Exact partition: per-(split, lang) doc counts in the query's
    // output sum back to the corpus with no overlap or loss.
    val out = SparkEntry.queries("q_train_split")(spark, Sf).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == docs.count(), s"split counts sum to $total")
    assert(out.map(_.getString(0)).toSet == Set("train", "val", "test"))
  }

  test("sequence packs tile each language stream: no overlap, no token loss") {
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val packs = SparkEntry.queries("q_pack_sequences")(spark, Sf).collect()
      .map(r => (r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("pack_id")),
        r.getLong(r.fieldIndex("pack_tokens")),
        r.getLong(r.fieldIndex("first_doc")),
        r.getLong(r.fieldIndex("last_doc"))))
    packs.groupBy(_._1).foreach { case (lang, ps) =>
      val ordered = ps.sortBy(_._2)
      // doc_id ranges are disjoint and ascend with pack_id.
      ordered.sliding(2).foreach {
        case Array((_, p0, _, _, last0), (_, p1, _, first1, _)) =>
          assert(p0 < p1 && last0 < first1, s"$lang packs $p0/$p1 overlap")
        case _ =>
      }
      assert(ordered.map(_._3).sum == docs(lang), s"$lang lost tokens")
      ordered.foreach { case (_, _, t, f, l) =>
        assert(t > 0 && f <= l)
      }
    }
  }
}
