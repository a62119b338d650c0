package graft.functions

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** BPE trainer + encoder: golden merges on the classic toy vocabulary,
  * and agreement between the plain-Scala encoder (driver budget path)
  * and the column-expression encoder (distributed counting / oracle
  * path) on the real corpus.
  */
class BpeSpec extends SparkSpec {

  test("trainer learns the classic merges with deterministic tie-breaks") {
    // low:5 lower:2 newest:6 widest:3 — pair counts give (e,s)=9 and
    // (s,t)=9 in round 1 (lexicographic tie → (e,s)), then (es,t)=9,
    // then (l,o)=7 vs (o,w)=7 (tie → (l,o)).
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(vocab, 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")), s"got $merges")
  }

  test("trainer stops when no pairs remain") {
    val merges = Bpe.trainMerges(Seq(("ab", 1L)), 10)
    assert(merges == Seq(("a", "b")))
  }

  test("encoder applies merges greedily: counts shrink to full-word symbols") {
    val merges = Bpe.trainMerges(Seq(("aaaa", 1L)), 10)
    // "aaaa" → merge (a,a) → [aa, aa] → merge (aa,aa) → [aaaa]: 1 subword.
    assert(Bpe.countSubwords("aaaa", merges) == 1)
    // Greedy left-to-right on an odd run: [aaaa, a] = 2.
    assert(Bpe.countSubwords("aaaaa", merges) == 2)
  }

  test("column encoder agrees with the Scala encoder on the real corpus") {
    val docs = Tables.documents(spark, Sf)
    val merges = Bpe.trainMergesFrom(docs, "text", 8)
    assert(merges.size == 8)
    val viaCol = docs
      .select(col("doc_id"), col("text"),
        Bpe.countSubwordsCol(col("text"), merges).as("n"))
      .orderBy("doc_id").limit(25).collect()
    viaCol.foreach { r =>
      assert(r.getLong(2) == Bpe.countSubwords(r.getString(1), merges).toLong,
        s"doc ${r.getLong(0)}: col=${r.getLong(2)} scala=${Bpe.countSubwords(r.getString(1), merges)}")
    }
  }

  test("q_token_budget_bpe: rows kept, cumulative sum monotone under the cap") {
    val out = graft.SparkEntry.queries("q_token_budget_bpe")(spark, Sf).collect()
    assert(out.nonEmpty)
    val cums = out.map(_.getLong(3))
    assert(cums.toSeq == cums.sorted.toSeq)
    assert(cums.last <= 6000L)
    // BPE costs are real subword counts: strictly under chars (merged)
    // and at least the pretoken count.
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
  }
}
