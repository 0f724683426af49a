package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video temporal near-duplicate detection — the video leg of the
  * perceptual-dedup triad ([[ImageHash]] images, [[AudioHash]] audio):
  * decode [[AviDecode]] frames → per-frame 56-bit dHash → candidate
  * video pairs via the banded pigeonhole on FRAME hashes → temporal
  * alignment verification (count aligned positions within Hamming
  * `maxDist` at each offset in ±`maxOffset`, keep pairs with ≥
  * `minMatch` aligned matches at the best offset).
  *
  * Completeness: a pair with any aligned match has at least one frame
  * pair within `maxDist`, and the pigeonhole (maxDist < bands) guarantees
  * that frame pair collides in some clean band — so the candidate set is
  * COMPLETE, and exact verification runs only on candidates. The
  * alignment join is equi (id, frame+offset) with a constant
  * 2·maxOffset+1 explode factor; nothing driver-sized anywhere, so the
  * whole shape shuffles on small integer keys at any corpus size.
  */
object VideoHash {

  /** (media_id, f, dhash): per-frame 56-bit dHash per decodable video.
    * Undecodable payloads quarantine to no rows.
    */
  def frameHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("f", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val id = row.getLong(0)
          val payload = if (row.isNullAt(1)) null else row.getAs[Array[Byte]](1)
          AviDecode.decode(payload).toSeq.flatMap { v =>
            (0 until v.nFrames).map { f =>
              val img = PixelDecode.Image("avi", v.width, v.height, 3, v.frames(f))
              org.apache.spark.sql.Row(id, f, ImageHash.dhashOf(img))
            }
          }
        }
      }(enc)
  }

  /** Temporally aligned near-duplicate videos.
    *
    * @return (id_a, id_b, offset, matched) with id_a < id_b: `offset` is
    *         the frame shift o (frame f of a aligns with f+o of b)
    *         maximizing the aligned-match count (ties → smallest o), and
    *         `matched` that count; only pairs with matched ≥ `minMatch`.
    */
  def nearDuplicates(media: DataFrame, maxDist: Int = 2, maxOffset: Int = 2,
      minMatch: Int = 2): DataFrame =
    // frame hashes feed BOTH the candidate generator and the alignment
    // verify — materialize once so the decode runs once
    nearDuplicatesFromHashes(
      graft.operators.Materialize.once(frameHashes(media)),
      maxDist, maxOffset, minMatch)

  /** [[nearDuplicates]] over an ALREADY-HASHED frame table (media_id, f,
    * dhash) — e.g. a persisted per-fixture hash cache or a stored index;
    * the decode pass is skipped entirely. The input is scanned several
    * times (candidates + both alignment sides): pass a materialized or
    * file-backed frame, not an expensive lazy plan.
    */
  def nearDuplicatesFromHashes(fh: DataFrame, maxDist: Int = 2,
      maxOffset: Int = 2, minMatch: Int = 2): DataFrame = {
    val bits = ImageHash.Bits
    val bands = 4
    require(maxDist < bands, s"pigeonhole needs maxDist ($maxDist) < bands ($bands)")

    // candidate generation at DISTINCT-HASH granularity (see HammingJoin's
    // scaladoc): clone-dense corpora put hundreds of identical frames in
    // one bucket, and frame-level banding would pay Σ C(bucket, 2)
    // quadratically in clone density; at value granularity the banded
    // join touches |distinct frame hashes| rows and the expansion back to
    // video pairs is output-sized
    val vp = graft.operators.HammingJoin.valuePairs(
      fh.select(col("dhash").as("h")), bits, bands, maxDist)
    val byHash = fh.select(col("dhash"), col("media_id")).distinct()
    val cand = vp
      .join(byHash.select(col("dhash").as("h_a"), col("media_id").as("va")),
        Seq("h_a"))
      .join(byHash.select(col("dhash").as("h_b"), col("media_id").as("vb")),
        Seq("h_b"))
      .filter(col("va") =!= col("vb"))
      .select(least(col("va"), col("vb")).as("id_a"),
        greatest(col("va"), col("vb")).as("id_b"))
      .distinct()

    // alignment verify on candidates only: constant offset explode, equi
    // join on (video, frame+offset), exact popcount filter
    val fa = fh.select(col("media_id").as("id_a"), col("f").as("fa"),
      col("dhash").as("h_a"))
    val fb = fh.select(col("media_id").as("id_b"), col("f").as("fb"),
      col("dhash").as("h_b"))
    val aligned = cand
      .join(fa, Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("fa"), col("h_a"),
        explode(sequence(lit(-maxOffset), lit(maxOffset))).as("o"))
      .withColumn("fb", col("fa") + col("o"))
      .join(fb, Seq("id_b", "fb"))
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= maxDist)
      .groupBy("id_a", "id_b", "o").agg(count(lit(1)).as("matched"))
      .filter(col("matched") >= minMatch)
    // best offset per pair: max matched, ties → smallest offset (struct
    // max orders lexicographically, so negate o for the tie-break)
    aligned
      .groupBy("id_a", "id_b")
      .agg(max(struct(col("matched"), (-col("o")).as("nego"))).as("best"))
      .select(col("id_a"), col("id_b"),
        (-col("best.nego")).cast("int").as("offset"),
        col("best.matched").as("matched"))
  }
}
