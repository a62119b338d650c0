package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Mirrors the semantics of the reference's vector layer (cosine / dot /
  * L2-normalize; reference: alma/storage/sqlite_local.py:555-601 and
  * alma/consolidation/engine.py:330-355) but expressed as Catalyst
  * higher-order-function expressions so similarity is just a column —
  * no side index, no driver round-trip. All arithmetic is promoted to
  * double before accumulating.
  *
  * Scale note: these are per-row O(dim) expressions; a kNN over 100 TB is
  * a scan + top-k, which Spark executes as a per-partition
  * TakeOrderedAndProject — no shuffle of the full corpus.
  */
object VectorFunctions {

  /** Sum of elementwise products, accumulated in double. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm, in double. */
  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity between two vector columns. */
  def cosine(a: Column, b: Column): Column = dotD(a, b) / (norm2(a) * norm2(b))

  /** Cosine against a constant query vector whose norm is precomputed on
    * the driver (the reference's L2-normalize-once trick,
    * sqlite_local.py:571-572 — normalizing at plan time makes the per-row
    * work a single dot product).
    */
  def cosineConst(a: Column, q: Array[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    dotD(a, lit(q)) / (norm2(a) * lit(qn))
  }

  /** L2-normalized copy of a vector column (float-preserving). */
  def l2normalize(a: Column): Column = {
    val n = norm2(a)
    transform(a, x => (x.cast("double") / n))
  }

  /** Coarse IVF-style bucket id from the sign bits of the first `bits`
    * dimensions — the cheap, deterministic ANN partitioner used by the
    * bucketed kNN path. At scale this becomes the partition/bucket key so
    * a probe only scans matching buckets.
    */
  def signBucket(a: Column, bits: Int): Column =
    (1 to bits).map { i =>
      when(element_at(a, i) >= 0f, lit(1L << (i - 1))).otherwise(lit(0L))
    }.reduce(_ + _)
}
