package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    Seq((1L, "hello world"), (2L, "spark multimodal payload bytes"))
      .toDF("doc_id", "text"))

  test("fromDocuments produces binary payloads under the media schema") {
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.count() === 2)
  }

  test("extractFeatures: correct byte counts, md5 checksum, 8-dim features") {
    val out = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("n_bytes") === "hello world".getBytes("UTF-8").length)
    assert(out(0).getAs[String]("checksum") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(0).getAs[Seq[Float]]("feature").length === 8)
  }

  test("extractFeatures is deterministic") {
    val a = Multimodal.extractFeatures(media).collect().map(_.toString).sorted
    val b = Multimodal.extractFeatures(media).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("sampleFrames emits one chunk row per frame") {
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() === 8)
    assert(frames.filter($"frame_bytes".isNull).count() === 0)
  }

  // a complete, valid 1x1 red PNG (public format example bytes: signature,
  // IHDR 8-bit truecolor, one zlib-deflated IDAT scanline, IEND)
  private val onePxPng: Array[Byte] = (
    "89504e470d0a1a0a" +
    "0000000d49484452000000010000000108020000009077" + "3dd8" +
    "0000000c494441547801636860f80f00010501" + "27de51c2" +
    "0000000049454e44ae426082"
  ).replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("ImageHeaders parses real PNG/BMP/GIF/JPEG header bytes") {
    assert(ImageHeaders.decode(onePxPng) === Some(("png", 1, 1, 8)))

    // minimal BMP: 2x3, 24-bit, BITMAPINFOHEADER
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(14) = 40 // biSize
    bmp(18) = 2  // width LE
    bmp(22) = 3  // height LE
    bmp(28) = 24 // bit count LE
    assert(ImageHeaders.decode(bmp) === Some(("bmp", 2, 3, 24)))

    // GIF89a logical screen 320x200, packed byte color-res bits = 7
    val gif = ("474946383961" + "4001" + "c800" + "f7" + "00" + "00")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray ++ new Array[Byte](4)
    assert(ImageHeaders.decode(gif) === Some(("gif", 320, 200, 8)))

    // JPEG: SOI, APP0 (skipped), SOF0 with precision 8, 16x32
    val jpeg = ("ffd8" + "ffe00004" + "0000" +
      "ffc0000b" + "08" + "0020" + "0010" + "00")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(ImageHeaders.decode(jpeg) === Some(("jpeg", 16, 32, 8)))

    // unknown magic → None, never a throw
    assert(ImageHeaders.decode("plain text".getBytes) === None)
    assert(ImageHeaders.decode(Array.emptyByteArray) === None)
    assert(ImageHeaders.decode(null) === None)
  }

  test("synthetic builders emit REAL containers: geometry round-trips and " +
      "PNG chunk CRCs are genuine") {
    val df = Seq((10L, "pixel payload bytes here"), (11L, "x"))
      .toDF("media_id", "text")
    val png = df.select($"media_id",
      Multimodal.syntheticPng(lit(640), lit(480), $"text".cast("binary")).as("payload"))
    val bmp = df.select($"media_id",
      Multimodal.syntheticBmp(lit(1920), lit(1080), $"text".cast("binary")).as("payload"))

    val pngRow = Multimodal.decodeHeaders(png).orderBy("media_id").collect()(0)
    assert((pngRow.getString(1), pngRow.getInt(2), pngRow.getInt(3), pngRow.getInt(4)) ===
      ("png", 640, 480, 8))
    val bmpRow = Multimodal.decodeHeaders(bmp).orderBy("media_id").collect()(0)
    assert((bmpRow.getString(1), bmpRow.getInt(2), bmpRow.getInt(3), bmpRow.getInt(4)) ===
      ("bmp", 1920, 1080, 24))

    // CRC authenticity: verify the IHDR CRC with java.util.zip.CRC32
    val bytes = png.orderBy("media_id").collect()(0).getAs[Array[Byte]]("payload")
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 4 + 13) // chunk type + IHDR data
    val stored = java.nio.ByteBuffer.wrap(bytes, 29, 4).getInt & 0xffffffffL
    assert(stored === crc.getValue)
    // declared sizes match: 57 + data for PNG, 54 + data for BMP
    assert(bytes.length === 57 + "pixel payload bytes here".length)
    val bmpBytes = bmp.orderBy("media_id").collect()(0).getAs[Array[Byte]]("payload")
    assert(bmpBytes.length === 54 + "pixel payload bytes here".length)
  }
}
