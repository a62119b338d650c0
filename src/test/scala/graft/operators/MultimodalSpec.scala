package graft.operators

import graft.SparkSpec

/** The media-decoder seam: the default byte-stat stub is deterministic,
  * and a custom decoder drops into the same query without changing its
  * schema — the contract a real image/audio decoder would rely on.
  */
class MultimodalSpec extends SparkSpec {

  test("default decoder is deterministic byte statistics") {
    val f = Multimodal.ByteStatDecoder.decode("abc".getBytes("UTF-8"))
    assert(f.nBytes == 3)
    assert(f == Multimodal.ByteStatDecoder.decode("abc".getBytes("UTF-8")))
    val empty = Multimodal.ByteStatDecoder.decode(Array.emptyByteArray)
    assert(empty == Multimodal.MediaFeatures(0L, 0L, 0.0))
  }

  test("a custom decoder slots into decodeQuery without schema changes") {
    object ConstDecoder extends Multimodal.MediaDecoder {
      def decode(payload: Array[Byte]): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(payload.length.toLong, 42L, 0.5)
    }
    val out = Multimodal.decodeQuery(spark, Sf, ConstDecoder)
    assert(out.columns.toSeq == Seq("doc_id", "n_bytes", "checksum", "mean_byte"))
    val rows = out.limit(5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) == 42L && r.getDouble(3) == 0.5))
  }

  test("the named query and the seam default agree") {
    val viaSeam = Multimodal.decodeQuery(spark, Sf).limit(3).collect().toSeq
    val viaQuery = graft.SparkEntry.queries("q_multimodal_decode")(spark, Sf)
      .limit(3).collect().toSeq
    assert(viaSeam.map(_.toSeq) == viaQuery.map(_.toSeq))
  }
}
