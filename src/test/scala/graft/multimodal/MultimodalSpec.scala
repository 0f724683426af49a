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
}
