package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Audio fingerprinting by energy contour — the dHash idea on the time
  * axis: decode PCM → frame the first `MaxFrames` windows of `FrameSize`
  * samples → exact integer energy Σs² per frame → bit f set iff
  * e(f+1) > e(f) (63 bits). Gain-invariant *shape* hashing with zero floating
  * point, so the fingerprint replays from the sample FORMULA in SQL.
  * Clips shorter than two frames produce no fingerprint.
  *
  * Pair discovery reuses [[graft.operators.HammingJoin]].
  */
object AudioHash {

  val FrameSize = 16
  val MaxFrames = 64
  val Bits: Int = MaxFrames - 1 // 63 comparison bits, sign-safe

  /** 63-bit energy-contour fingerprint; mono/first-channel samples. */
  private[multimodal] def fingerprintOf(clip: WavDecode.Clip): Option[Long] = {
    val n = math.min(clip.nFrames, FrameSize * MaxFrames)
    val frames = n / FrameSize
    if (frames < 2) None
    else {
      val e = new Array[Long](frames)
      var f = 0
      while (f < frames) {
        var i = f * FrameSize
        val hi = i + FrameSize
        var acc = 0L
        while (i < hi) {
          val s = clip.samples(i * clip.channels).toLong // first channel
          acc += s * s
          i += 1
        }
        e(f) = acc
        f += 1
      }
      var hash = 0L
      f = 0
      while (f < frames - 1) {
        if (e(f + 1) > e(f)) hash |= 1L << f
        f += 1
      }
      Some(hash)
    }
  }

  /** (media_id, fp, n_frames) per decodable clip with ≥ 2 frames. */
  def fingerprint(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val id = row.getLong(0)
          val payload = if (row.isNullAt(1)) null else row.getAs[Array[Byte]](1)
          for {
            clip <- WavDecode.decode(payload)
            fp <- fingerprintOf(clip)
          } yield org.apache.spark.sql.Row(id, fp,
            math.min(clip.nFrames, FrameSize * MaxFrames) / FrameSize)
        }
      }(enc)
  }

  /** Near-duplicate clips within Hamming `maxDist` (< 4). */
  def nearDuplicates(media: DataFrame, maxDist: Int = 2): DataFrame =
    graft.operators.HammingJoin.selfPairs(
      fingerprint(media).drop("n_frames"), "media_id", "fp",
      bits = Bits, bands = 4, maxDist = maxDist)
}
