package graft.operators

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with feature extraction over the bytes. The decode stage is a real
  * JDK-only image decoder (`javax.imageio` — PNG/BMP/JPEG/GIF readers
  * ship with the JRE): payloads that decode as images emit true
  * width/height/channel/luminance features; payloads that don't fall
  * back to deterministic byte statistics with zeroed image dims. The
  * Spark-side contract (binary column, metadata struct, per-partition
  * feature extraction, no driver round-trip) is the shape a 100 TB
  * media pipeline uses; heavier codecs (audio/video) drop into the same
  * `MediaDecoder` seam.
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
    * executors, fixed feature contract. Heavier codecs drop in without
    * touching `decodeQuery` or its schema.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaFeatures
  }

  /** The fixed decode output contract (the query's schema): byte-level
    * stats for every payload, plus image dims/stats when the payload
    * decodes as an image (zeroed otherwise).
    */
  final case class MediaFeatures(
      nBytes: Long, checksum: Long, meanByte: Double,
      width: Int, height: Int, channels: Int, meanLuma: Double)

  /** Byte-statistics decoder: the cheap pass for payloads with no
    * decodable structure (and the fallback features every decoder
    * emits). Image dims stay zero.
    */
  object ByteStatDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaFeatures = {
      var checksum = 0L
      var i = 0
      while (i < payload.length) { checksum = (checksum * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
      val meanByte = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / payload.length
      MediaFeatures(payload.length.toLong, checksum, meanByte, 0, 0, 0, 0.0)
    }
  }

  /** Real image decode, JDK-only (`javax.imageio` ships with the JRE:
    * PNG/BMP/JPEG/GIF): width, height, color channels, and mean
    * luminance (BT.601 weights) over a bounded pixel sample. Memory is
    * bounded two ways: dimensions are read from the HEADER before any
    * raster is allocated, and payloads whose raster would exceed
    * `maxPixels` (a decompression bomb: a few-KB PNG can declare a
    * multi-gigapixel raster) report their true dims with `channels = 0`
    * marking the skipped decode. Non-image payloads (no reader matches
    * the magic bytes) degrade to byte statistics with zeroed dims, so
    * one query handles a mixed binary column.
    */
  object ImageIoDecoder extends MediaDecoder {
    private val MaxSampleSide = 256
    private val DefaultMaxPixels = 64L * 1024 * 1024 // ≤ 256 MB ARGB raster

    /** Magic-byte probe for the formats ImageIO ships readers for
      * (PNG, JPEG, GIF, BMP): a mixed binary column is mostly
      * non-image, and spinning up the ImageIO reader registry per row
      * costs ~0.4 ms even to say "no" — the probe keeps the fallback
      * branch at byte-stat speed.
      */
    private def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
        (p(0) == 'B' && p(1) == 'M'))

    def decode(payload: Array[Byte]): MediaFeatures = decode(payload, DefaultMaxPixels)

    private[operators] def decode(payload: Array[Byte], maxPixels: Long): MediaFeatures = {
      val base = ByteStatDecoder.decode(payload)
      if (!looksLikeImage(payload)) return base
      try {
        // Heap-cached stream constructed directly: createImageInputStream
        // consults the JVM-global useCache flag, whose default is a
        // DISK-backed cache — one temp file per decoded row (see the
        // q_image_phash rationale). Per-row decoders must never touch
        // disk for stream caching.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return base
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w.toLong * h > maxPixels) base.copy(width = w, height = h)
            else {
              val img = reader.read(0)
              val stepX = math.max(1, w / MaxSampleSide)
              val stepY = math.max(1, h / MaxSampleSide)
              var lumaSum = 0.0
              var n = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  lumaSum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  n += 1
                  x += stepX
                }
                y += stepY
              }
              base.copy(width = w, height = h,
                channels = img.getColorModel.getNumComponents,
                meanLuma = if (n == 0) 0.0 else lumaSum / n)
            }
          } finally reader.dispose()
        } finally iis.close()
      } catch { case _: java.io.IOException | _: RuntimeException => base }
    }
  }

  /** Typed audio metadata (the audio half of the multimodal contract):
    * sample rate, channels, frame count, duration. JDK-only —
    * `javax.sound.sampled` ships WAV/AIFF/AU readers with the JRE; only
    * the container header is parsed, so cost per row is O(header), not
    * O(payload). Payloads no reader recognizes return None (callers
    * keep the row with null metadata, mirroring the image fallback).
    */
  final case class AudioMeta(
      sampleRateHz: Double, channels: Int, frames: Long, durationMs: Double)

  object AudioIoDecoder extends Serializable {
    private def looksLikeAudio(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') || // WAV
        (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') || // AIFF
        (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd')) // AU

    def decode(payload: Array[Byte]): Option[AudioMeta] = {
      if (!looksLikeAudio(payload)) None
      else
        try {
          val aff = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
          val fmt = aff.getFormat
          val frames = aff.getFrameLength.toLong
          Some(AudioMeta(
            fmt.getSampleRate.toDouble, fmt.getChannels, frames,
            if (fmt.getFrameRate > 0) frames * 1000.0 / fmt.getFrameRate else 0.0))
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException => None
        }
    }
  }

  /** Synthesize a PCM-silence WAV container — the generator half of the
    * audio round-trip (runs on executors; also used by MultimodalSpec's
    * golden tests).
    */
  def wavBytes(sampleRate: Float, channels: Int, frames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Minimal 24-bit BMP container around an 8×8 grayscale raster — the
    * image twin of [[wavBytes]]: an executor-side fixture generator so
    * the REAL ImageIO decode path sits inside an oracle-checked query.
    * Rows write bottom-up per the BMP spec; 8·3 = 24 row bytes are
    * already 4-aligned, so no padding.
    */
  def bmpBytes(px: Array[Int]): Array[Byte] = {
    val (w, h) = (8, 8)
    val dataSize = w * 3 * h
    val b = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x).toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      y -= 1
    }
    b.array()
  }

  /** 64-char average-hash bit string of a decoded 8×8 image: bit
    * (y·8 + x) set when the pixel exceeds the image mean. The strict
    * comparison stays in integers (v·64 > Σv) so both engines decide
    * every bit identically — and the hash is exactly invariant under a
    * uniform brightness shift ((v+k)·64 > Σv + 64k ⟺ v·64 > Σv),
    * which is the perceptual property the dedup query exploits.
    */
  def aHashBits(img: java.awt.image.BufferedImage): String = {
    val vs = new Array[Int](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = img.getRGB(x, y) & 0xff
        vs(y * 8 + x) = v
        sum += v
        x += 1
      }
      y += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) {
      sb.append(if (vs(i) * 64L > sum) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Binary column → typed audio metadata rows (null metadata for
    * non-audio payloads): the same per-partition, no-driver-round-trip
    * plumbing as `decodeQuery`, with the audio schema.
    */
  def audioMeta(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        AudioIoDecoder.decode(payload) match {
          case Some(m) => (id, Some(m.sampleRateHz), Some(m.channels), Some(m.frames), Some(m.durationMs))
          case None => (id, None, None, None, None)
        }
      })
      .toDF(idCol, "sample_rate_hz", "channels", "frames", "duration_ms")
  }

  /** Binary ingest → per-partition feature extraction through the
    * decoder seam. Means are floored to integers so every output column
    * is exact arithmetic — which lets the query carry a REAL oracle:
    * on this corpus the payloads are (pure-ASCII) text bytes, so the
    * oracle replays the byte-stat fallback branch in SQL (checksum
    * fold, byte mean, zeroed image dims) and any drift in the probe or
    * fallback semantics breaks the hash. The image branch is library
    * code (not ANSI SQL) and is golden-tested in MultimodalSpec against
    * real PNG/BMP bytes instead.
    */
  def decodeQuery(s: SparkSession, dir: String,
      decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    import s.implicits._
    val withPayload = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    withPayload
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val f = decoder.decode(payload)
        (id, f.nBytes, f.checksum, math.floor(f.meanByte).toLong,
          f.width, f.height, f.channels, math.floor(f.meanLuma).toLong)
      })
      .toDF("doc_id", "n_bytes", "checksum", "mean_byte_floor",
        "width", "height", "channels", "mean_luma_floor")
      .orderBy("doc_id")
  }

  private def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    decodeQuery(s, dir)

  // Audio round-trip: WAV containers are SYNTHESIZED on the executors
  // from event-derived parameters, then parsed back by the JDK header
  // decoder; the oracle recomputes the parameters directly from events,
  // so any write/parse infidelity in the container path breaks the
  // hash. (duration_ms is kept out of the query output — it is a float
  // ratio whose rounding is not portable; the three integers pin the
  // parse exactly.)
  private def audioRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val params = Tables.events(s, dir)
      .filter(col("event_id") < 200)
      .select(col("event_id"),
        (lit(8000) + (col("event_id") % 4) * 4000).cast("int").as("rate"),
        (lit(1) + col("event_id") % 2).cast("int").as("ch"),
        (lit(100) + (col("event_id") % 50) * 10).cast("int").as("frames"))
    val withWav = params.as[(Long, Int, Int, Int)]
      .mapPartitions(_.map { case (id, rate, ch, frames) =>
        (id, wavBytes(rate.toFloat, ch, frames))
      })
      .toDF("event_id", "payload")
    audioMeta(withWav, "event_id", "payload")
      .select(col("event_id"), col("sample_rate_hz").cast("long").as("sample_rate_hz"),
        col("channels"), col("frames"))
      .orderBy("event_id")
  }

  private val audioRoundtripSql =
    """SELECT event_id,
      |  (8000 + (event_id % 4) * 4000)::BIGINT AS sample_rate_hz,
      |  (1 + event_id % 2)::INT AS channels,
      |  (100 + (event_id % 50) * 10)::BIGINT AS frames
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin

  // The fallback-branch oracle: checksum is the same 31-multiplier fold
  // over byte values (pure-ASCII corpus → char codes ARE the UTF-8
  // bytes, verified for all testdata SFs), the mean is exact integer
  // division, and the image features are the fallback's zeros.
  private val multimodalDecodeSql =
    """WITH b AS (
      |  SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes,
      |    list_transform(string_split(text, ''), c -> ascii(c)::BIGINT) AS codes
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |  list_reduce(list_prepend(0::BIGINT, codes),
      |    (acc, c) -> (acc * 31 + c) & 4294967295)::BIGINT AS checksum,
      |  (CASE WHEN n_bytes = 0 THEN 0 ELSE list_sum(codes) // n_bytes END)::BIGINT AS mean_byte_floor,
      |  0::INT AS width, 0::INT AS height, 0::INT AS channels,
      |  0::BIGINT AS mean_luma_floor
      |FROM b ORDER BY doc_id""".stripMargin

  // q_image_phash — perceptual-hash image dedup through the REAL
  // decoder: each doc synthesizes a textured 8×8 BMP on the executors
  // (40 base patterns × 5 uniform brightness offsets), ImageIO decodes
  // it back, and the 64-bit average-hash groups the brightness variants
  // that exact byte-dedup would keep apart — `n_variants` counts the
  // byte-distinct payloads each perceptual group collapsed. Scale
  // shape: decode + hash is a per-partition projection (no driver
  // round-trip); the groupBy key is the 64-char hash, map-side-combined
  // to distinct-pattern cardinality. The oracle replays the pixel
  // formula arithmetically — the decode round-trip is exactly what the
  // Spark side adds on top, so a decoder defect IS an oracle diff.
  private def imagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val params = Tables.documents(s, dir)
      // off must not be a function of gid (5 divides 40): shift by the
      // doc's group INDEX so every pattern sees all 5 brightnesses.
      .select(col("doc_id"), (col("doc_id") % 40).as("gid"),
        (expr("doc_id DIV 40") % 5).as("off"))
    val hashed = params.as[(Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, gid, off) =>
          val px = Array.tabulate(64) { i =>
            val (x, y) = (i % 8, i / 8)
            ((gid * 37 + x * 7 + y * 13 + (x * y * (gid + 1)) % 97) % 251 + off).toInt
          }
          // ImageIO.read(InputStream) wraps the stream via the
          // globally-configured cache — by default a DISK-backed one
          // that creates (and deletes) a temp file per read and
          // serializes on the registry lock: with 32 threads × one
          // read per row that is temp-file churn growing with corpus
          // size, measured as run-over-run slowdowns at ×100.
          // Constructing the heap-cached stream DIRECTLY gets the
          // in-memory behavior per call without mutating the
          // JVM-global ImageIO.setUseCache default for every other
          // ImageIO user in the process; read(ImageInputStream)
          // closes the stream when done.
          val img = javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bmpBytes(px))))
          (id, off, aHashBits(img))
        }
      }
      .toDF("doc_id", "off", "ahash")
    hashed.groupBy("ahash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"),
        countDistinct(col("off")).as("n_variants"))
      .orderBy("first_doc")
  }

  private val imagePhashSql =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 40 AS gid, (doc_id // 40) % 5 AS off FROM documents),
      |px AS (
      |  SELECT doc_id, off, r.range AS i,
      |    ((gid * 37 + (r.range % 8) * 7 + (r.range // 8) * 13 +
      |      ((r.range % 8) * (r.range // 8) * (gid + 1)) % 97) % 251 + off) AS v
      |  FROM g CROSS JOIN range(0, 64) r),
      |tot AS (SELECT doc_id, sum(v)::BIGINT AS total FROM px GROUP BY 1),
      |bits AS (
      |  SELECT px.doc_id, min(px.off)::BIGINT AS off,
      |    string_agg(CASE WHEN px.v * 64 > t.total THEN '1' ELSE '0' END,
      |      '' ORDER BY px.i) AS ahash
      |  FROM px JOIN tot t USING (doc_id) GROUP BY px.doc_id)
      |SELECT ahash, count(*)::BIGINT AS n_docs, min(doc_id) AS first_doc,
      |  count(DISTINCT off)::BIGINT AS n_variants
      |FROM bits GROUP BY 1 ORDER BY first_doc""".stripMargin

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
    Q("q_multimodal_decode", multimodalDecode, Some(multimodalDecodeSql)),
    Q("q_audio_roundtrip", audioRoundtrip, Some(audioRoundtripSql)),
    Q("q_image_phash", imagePhash, Some(imagePhashSql)),
    Q("q_crossencoder_rerank", crossencoderRerank, Some(crossencoderRerankSql)))
}
