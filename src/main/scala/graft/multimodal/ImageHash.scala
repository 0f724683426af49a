package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Perceptual image hashing (dHash) for image-level dedup — the
  * multimodal sibling of MinHash/SimHash text dedup: decode → nearest
  * resize to an 8×8 grid → horizontal gradient bits → one 56-bit
  * fingerprint per image. Brightness-invariant by construction (a
  * constant shift leaves every comparison unchanged) and integer-exact
  * end to end, so the hash replays from the pixel FORMULA in SQL.
  *
  * Pair discovery is [[graft.operators.HammingJoin]] — banded pigeonhole
  * buckets, exact popcount verification on candidates only. The decode
  * is per-row executor byte work (mapPartitions, like every decoder
  * here); everything after the hash is ordinary relational shuffle on
  * 56-bit keys.
  */
object ImageHash {

  val GridRows = 8
  val GridCols = 8 // 7 comparisons per row → 56 bits, sign-safe in a Long
  val Bits: Int = GridRows * (GridCols - 1)

  /** 56-bit dHash of a decoded image: gray = green channel (channel 0
    * for single-channel images); bit (r,c) = g(r,c+1) > g(r,c) after a
    * GridRows×GridCols nearest resize. */
  private[multimodal] def dhashOf(img: PixelDecode.Image): Long = {
    val small = Multimodal.resizeNearest(img, GridCols, GridRows)
    val ch = if (small.channels > 1) 1 else 0
    var hash = 0L
    var r = 0
    while (r < GridRows) {
      var c = 0
      while (c < GridCols - 1) {
        if (small.at(r, c + 1, ch) > small.at(r, c, ch))
          hash |= 1L << (r * (GridCols - 1) + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** (media_id, dhash) per decodable image; undecodable payloads drop. */
  def dhash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val id = row.getLong(0)
          val payload = if (row.isNullAt(1)) null else row.getAs[Array[Byte]](1)
          PixelDecode.decode(payload).map { img =>
            org.apache.spark.sql.Row(id, dhashOf(img))
          }
        }
      }(enc)
  }

  /** Near-duplicate image pairs within Hamming `maxDist` (< 4). */
  def nearDuplicates(media: DataFrame, maxDist: Int = 2): DataFrame =
    graft.operators.HammingJoin.selfPairs(
      dhash(media), "media_id", "dhash", bits = Bits, bands = 4, maxDist = maxDist)
}
