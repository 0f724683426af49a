package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
    nearDuplicatesFromHashes(dhash(media), maxDist)

  /** [[nearDuplicates]] over an ALREADY-HASHED (media_id, dhash) table —
    * a persisted per-fixture hash cache or stored index; skips decode. */
  def nearDuplicatesFromHashes(hashes: DataFrame, maxDist: Int = 2): DataFrame =
    graft.operators.HammingJoin.selfPairs(
      hashes, "media_id", "dhash", bits = Bits, bands = 4, maxDist = maxDist)

  /** Incremental near-dup: probe a NEW batch against a STORED hash index
    * (the [[dhash]] output persisted by the caller — the q93
    * bandIndex/probeIndex posture for media). Only the batch is decoded
    * and hashed; the index side contributes its (media_id, dhash) rows
    * — value-sized, never the raw media. Candidates come from the
    * distinct-hash banding over the UNION hash set (index-internal pairs
    * are excluded), so probe cost is ∝ batch plus the true
    * batch-touching pair relation.
    *
    * @return (id_a, id_b, h_a, h_b, dist) with id_a < id_b and at least
    *         one side in the new batch — exactly [[nearDuplicates]] over
    *         the union corpus minus index-internal pairs.
    */
  def probeNearDuplicates(newMedia: DataFrame, index: DataFrame,
      maxDist: Int = 2): DataFrame = {
    val bh = dhash(newMedia).withColumn("__new", lit(1))
    val all = bh.unionByName(
      index.select(col("media_id"), col("dhash")).withColumn("__new", lit(0)))
    val vp = graft.operators.HammingJoin.valuePairs(
      all.select(col("dhash").as("h")), bits = Bits, bands = 4, maxDist)
    val a = all.select(col("media_id").as("__ia"), col("dhash").as("h_a"),
      col("__new").as("__na"))
    val b = all.select(col("media_id").as("__ib"), col("dhash").as("h_b"),
      col("__new").as("__nb"))
    vp.join(a, Seq("h_a")).join(b, Seq("h_b"))
      .filter(col("__na") + col("__nb") >= 1)
      .filter((col("h_a") < col("h_b") && col("__ia") =!= col("__ib")) ||
        (col("h_a") === col("h_b") && col("__ia") < col("__ib")))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        when(col("__ia") < col("__ib"), col("h_a")).otherwise(col("h_b")).as("h_a"),
        when(col("__ia") < col("__ib"), col("h_b")).otherwise(col("h_a")).as("h_b"),
        col("dist"))
  }
}
