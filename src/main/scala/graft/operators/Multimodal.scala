package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with feature extraction over the bytes. The real decode (image/audio
  * libraries) is not available in this environment, so the decode stage
  * is a deterministic stub — but the Spark-side contract (binary column,
  * metadata struct, per-row feature extraction, partition-parallel) is
  * the real one a 100 TB media pipeline would use.
  */
object Multimodal {

  // Binary payload + metadata features, fully column-expressed (the
  // cheap metadata pass that runs before any expensive decode).
  private def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("source"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))
      .orderBy("doc_id")

  private val multimodalMetaSql =
    """SELECT doc_id, source,
      |  octet_length(text::BLOB)::BIGINT AS n_bytes,
      |  ascii(substr(text, 1, 1))::BIGINT AS first_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Pluggable media decoder — the same seam pattern as `CrossScorer`
    * and `ExternalCompleter`: Serializable, executed per partition on
    * executors, fixed feature contract. A real implementation (image/
    * audio libraries, unavailable in this environment) drops in without
    * touching `decodeQuery` or its schema.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaFeatures
  }

  /** The fixed decode output contract (the query's schema). */
  final case class MediaFeatures(nBytes: Long, checksum: Long, meanByte: Double)

  /** STUB default: deterministic byte statistics standing in for
    * decoded-media features (no media libs in this sandbox). The
    * distributed plumbing around it — binary column in, fixed feature
    * schema out, per-partition execution, no driver round-trip — is the
    * real production shape.
    */
  object ByteStatDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaFeatures = {
      var checksum = 0L
      var i = 0
      while (i < payload.length) { checksum = (checksum * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
      val meanByte = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / payload.length
      MediaFeatures(payload.length.toLong, checksum, meanByte)
    }
  }

  /** Back-compat alias for the default decoder. */
  def decodeFeatures(payload: Array[Byte]): (Long, Long, Double) = {
    val f = ByteStatDecoder.decode(payload)
    (f.nBytes, f.checksum, f.meanByte)
  }

  /** Binary ingest → per-partition feature extraction through the
    * decoder seam (rows-only query: the default decoder is library
    * code, not ANSI SQL).
    */
  def decodeQuery(s: SparkSession, dir: String,
      decoder: MediaDecoder = ByteStatDecoder): DataFrame = {
    import s.implicits._
    val withPayload = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    withPayload
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val f = decoder.decode(payload)
        (id, f.nBytes, f.checksum, math.rint(f.meanByte * 10000) / 10000)
      })
      .toDF("doc_id", "n_bytes", "checksum", "mean_byte")
      .orderBy("doc_id")
  }

  private def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    decodeQuery(s, dir)

  // V8 cross-encoder re-rank stage through the CrossScorer seam. The
  // default lexical scorer (token-set cosine) is deterministic and
  // ANSI-SQL-expressible, so this stage is oracle-checked; a model
  // scorer slots into the same mapPartitions shape.
  private def crossencoderRerank(s: SparkSession, dir: String): DataFrame =
    graft.retrieval.CrossEncoder.rerank(
      s, Tables.documents(s, dir), "doc_id", "text",
      query = "spark join data query")
      .withColumn("ce_score", round(col("ce_score"), 6))
      .orderBy(col("ce_score").desc, col("doc_id"))
      .limit(20)

  private val crossencoderRerankSql =
    """SELECT doc_id,
      |  round(CASE WHEN len(t) = 0 THEN 0.0::DOUBLE
      |    ELSE len(list_filter(t, x -> x IN ('spark', 'join', 'data', 'query')))::DOUBLE
      |         / sqrt(4.0 * len(t)) END, 6) AS ce_score
      |FROM (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
      |  FROM documents)
      |ORDER BY ce_score DESC, doc_id LIMIT 20""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
    Q("q_multimodal_decode", multimodalDecode, None),
    Q("q_crossencoder_rerank", crossencoderRerank, Some(crossencoderRerankSql)))
}
