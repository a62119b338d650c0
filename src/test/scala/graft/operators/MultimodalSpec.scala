package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import javax.imageio.ImageIO

/** The media-decoder seam: real JDK ImageIO decode for image payloads
  * (golden-tested against generated PNG/BMP bytes), deterministic
  * byte-stat fallback for everything else, and a custom decoder dropping
  * into the same query without changing its schema.
  */
class MultimodalSpec extends SparkSpec {

  private def imageBytes(format: String, w: Int, h: Int, argb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, argb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer registered")
    out.toByteArray
  }

  test("byte-stat fallback is deterministic and zeroes image dims") {
    val f = Multimodal.ByteStatDecoder.decode("abc".getBytes("UTF-8"))
    assert(f.nBytes == 3)
    assert(f == Multimodal.ByteStatDecoder.decode("abc".getBytes("UTF-8")))
    val empty = Multimodal.ByteStatDecoder.decode(Array.emptyByteArray)
    assert(empty == Multimodal.MediaFeatures(0L, 0L, 0.0, 0, 0, 0, 0.0))
  }

  test("ImageIO decoder golden: real PNG bytes decode to exact dims and luminance") {
    // Solid mid-gray 8x4: luma = 0.299*100 + 0.587*100 + 0.114*100 = 100.
    val png = imageBytes("png", 8, 4, 0xff646464)
    val f = Multimodal.ImageIoDecoder.decode(png)
    assert(f.width == 8 && f.height == 4, s"dims: ${f.width}x${f.height}")
    assert(f.channels == 3, s"channels: ${f.channels}")
    assert(math.abs(f.meanLuma - 100.0) < 1e-9, s"luma: ${f.meanLuma}")
    assert(f.nBytes == png.length.toLong)
    // Decode is deterministic.
    assert(f == Multimodal.ImageIoDecoder.decode(png))
  }

  test("ImageIO decoder golden: BMP bytes and a two-tone luminance average") {
    // Left half white (luma 255), right half black (luma 0) → mean 127.5.
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xffffffff else 0xff000000)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", out))
    val f = Multimodal.ImageIoDecoder.decode(out.toByteArray)
    assert(f.width == 8 && f.height == 8)
    assert(math.abs(f.meanLuma - 127.5) < 1e-9, s"luma: ${f.meanLuma}")
  }

  test("an oversized raster reports header dims but skips the decode") {
    // 8x4 = 32 pixels against a 16-pixel cap: dims come from the header
    // (no raster allocated), channels = 0 marks the skipped decode.
    val png = imageBytes("png", 8, 4, 0xff646464)
    val f = Multimodal.ImageIoDecoder.decode(png, maxPixels = 16L)
    assert(f.width == 8 && f.height == 4)
    assert(f.channels == 0 && f.meanLuma == 0.0)
    assert(f.checksum == Multimodal.ByteStatDecoder.decode(png).checksum)
  }

  test("non-image payloads degrade to byte statistics with zero dims") {
    val f = Multimodal.ImageIoDecoder.decode("not an image at all".getBytes("UTF-8"))
    val bs = Multimodal.ByteStatDecoder.decode("not an image at all".getBytes("UTF-8"))
    assert(f == bs)
    assert(f.width == 0 && f.height == 0 && f.channels == 0)
  }

  test("a custom decoder slots into decodeQuery without schema changes") {
    object ConstDecoder extends Multimodal.MediaDecoder {
      def decode(payload: Array[Byte]): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(payload.length.toLong, 42L, 0.5, 1, 2, 3, 4.0)
    }
    val out = Multimodal.decodeQuery(spark, Sf, ConstDecoder)
    assert(out.columns.toSeq == Seq("doc_id", "n_bytes", "checksum", "mean_byte_floor",
      "width", "height", "channels", "mean_luma_floor"))
    val rows = out.limit(5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) == 42L && r.getLong(3) == 0L && r.getInt(4) == 1))
  }

  private def wavBytes(sampleRate: Float, channels: Int, frames: Int): Array[Byte] =
    Multimodal.wavBytes(sampleRate, channels, frames)

  test("audio decoder golden: real WAV bytes parse to exact format metadata") {
    val wav = wavBytes(44100f, 2, 4410) // 100 ms of silence, stereo
    val m = Multimodal.AudioIoDecoder.decode(wav)
    assert(m.isDefined, "WAV header not recognized")
    assert(m.get.sampleRateHz == 44100.0)
    assert(m.get.channels == 2)
    assert(m.get.frames == 4410L)
    assert(math.abs(m.get.durationMs - 100.0) < 1e-6, s"duration: ${m.get.durationMs}")
    assert(Multimodal.AudioIoDecoder.decode("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("audioMeta query: typed metadata for audio rows, nulls for the rest") {
    import spark.implicits._
    val wav = wavBytes(8000f, 1, 800) // 100 ms mono
    val rows = Seq((1L, wav), (2L, "plain text payload".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.audioMeta(rows, "id", "payload").orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(1) == 8000.0 && out(0).getInt(2) == 1 && out(0).getLong(3) == 800L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("the named query runs the ImageIO decoder and agrees with the seam") {
    val viaSeam = Multimodal.decodeQuery(spark, Sf).limit(3).collect().toSeq
    val viaQuery = graft.SparkEntry.queries("q_multimodal_decode")(spark, Sf)
      .limit(3).collect().toSeq
    assert(viaSeam.map(_.toSeq) == viaQuery.map(_.toSeq))
    // Text payloads take the fallback branch: dims zero, byte stats real.
    assert(viaSeam.forall(r => r.getInt(4) == 0 && r.getLong(1) > 0))
  }
}
