package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Frame hashing + temporal alignment behavior of the video near-dup
  * operator, against hand-built synthetic AVI clips.
  */
class VideoHashSpec extends SparkTestBase {
  import spark.implicits._

  private def clips(rows: Seq[(Long, Long, Int)]) = {
    // (media_id, seed, phase): 10×9 4-frame scramble clips
    val df = rows.toDF("media_id", "seed", "phase")
    df.select(col("media_id"),
      Multimodal.syntheticAviScramble(col("seed"), lit(10), lit(9),
        lit(4), col("phase")).as("payload"))
  }

  test("frameHashes: one 56-bit hash per frame; shifted clone shares content hashes") {
    val media = clips(Seq((1L, 5L, 0), (2L, 5L, 1)))
    val fh = VideoHash.frameHashes(media)
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(fh(1L).length === 4 && fh(2L).length === 4)
    val h1 = fh(1L).sortBy(_._2).map(_._3)
    val h2 = fh(2L).sortBy(_._2).map(_._3)
    assert(h1.forall(h => h >= 0 && h < (1L << 56)))
    // phase 1 clip's frame f carries phase-0 clip's frame f+1 content
    assert(h1.drop(1).sameElements(h2.dropRight(1)),
      s"shifted clone must share content hashes: ${h1.toSeq} vs ${h2.toSeq}")
  }

  test("nearDuplicates recovers the temporal offset of shifted clones") {
    val media = clips(Seq(
      (1L, 5L, 0), (2L, 5L, 2),   // same content, phase shift 2
      (3L, 77L, 0)))              // unrelated content
    val got = VideoHash.nearDuplicates(media, maxDist = 2, maxOffset = 2,
        minMatch = 2)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 2L)), got.toString)
    // clip 2's frame f is clip 1's frame f+2: offset o with fa+o=fb → o=-2
    assert(got.head._3 === -2, s"offset must be -2: $got")
    assert(got.head._4 === 2, "two aligned positions overlap at |shift|=2")
  }

  test("identical clips match at offset 0 with full frame count") {
    val media = clips(Seq((1L, 9L, 1), (2L, 9L, 1)))
    val got = VideoHash.nearDuplicates(media).as[(Long, Long, Int, Long)]
      .collect().toSeq
    assert(got === Seq((1L, 2L, 0, 4L)))
  }

  test("undecodable payloads quarantine; no pairs from empty hash sets") {
    val media = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    assert(VideoHash.frameHashes(media).count() === 0)
    assert(VideoHash.nearDuplicates(media).count() === 0)
  }
}
