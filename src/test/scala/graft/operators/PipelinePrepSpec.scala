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
