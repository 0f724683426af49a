package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded Hamming self-join over compact integer fingerprints (image
  * dHash, audio energy hashes, SimHash-like signatures): find all pairs
  * within Hamming distance `maxDist` without an all-pairs product.
  *
  * Pigeonhole: split the `bits`-bit hash into `bands` contiguous slices;
  * a pair differing in at most `maxDist < bands` bits leaves at least
  * one slice untouched, so the equi-join on (band, slice-value) is a
  * COMPLETE candidate generator. Exact popcount verification then runs
  * only on candidates — the same bucket-then-verify shape as the MinHash
  * and SimHash paths, shuffling on small integer keys.
  *
  * Candidates are generated at DISTINCT-HASH granularity, not row
  * granularity: perceptual hashes collapse duplicated content onto one
  * value, so a clone-dense corpus (the normal case in web-scale media —
  * and exactly what a dedup operator exists to find) puts hundreds of
  * rows in one bucket, and row-level banding would pay Σ C(bucket, 2)
  * QUADRATICALLY in clone density before verification could prune. At
  * value granularity the banded join touches |distinct hashes| rows, the
  * popcount verdict runs once per hash PAIR, and the id expansion that
  * follows is output-sized by definition. (Measured: the round-9 video
  * gate's x10 blowup ran minutes at frame granularity, seconds at value
  * granularity — same results.)
  */
object HammingJoin {

  /** Distinct-hash-level pairs within `maxDist`: (h_a, h_b, dist) with
    * h_a < h_b, PLUS the diagonal (h, h, 0) so callers can expand equal-
    * hash row groups. `hashes` must have column `h`.
    */
  def valuePairs(hashes: DataFrame, bits: Int, bands: Int,
      maxDist: Int): DataFrame = {
    require(maxDist < bands,
      s"pigeonhole needs maxDist ($maxDist) < bands ($bands)")
    require(bits > 0 && bits <= 63, "hash must fit a non-negative BIGINT")
    val w = (bits + bands - 1) / bands
    // Every band must carry ≥1 real bit: a zero-width band (bands over-
    // partitioning bits, e.g. bits=8 bands=6 → w=2, band 5 empty) has
    // slice value 0 for EVERY row, silently degenerating that band's
    // equi-join into an all-pairs product.
    require((bands - 1) * w < bits,
      s"bands ($bands) over-partition bits ($bits): band ${bands - 1} would be empty")
    val hv = hashes.select(col("h")).distinct()
    val slices: Seq[Column] = (0 until bands).map { b =>
      val lo = b * w
      val width = math.min(w, bits - lo)
      struct(lit(b).as("band"),
        shiftrightunsigned(col("h"), lo)
          .bitwiseAND(lit((1L << width) - 1)).as("bv"))
    }
    val banded = hv
      .select(col("h"), explode(array(slices: _*)).as("bb"))
      .select(col("h"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val cross = banded.select(col("h").as("h_a"), col("band"), col("bv"))
      .join(banded.select(col("h").as("h_b"), col("band"), col("bv")),
        Seq("band", "bv"))
      .filter(col("h_a") < col("h_b"))
      .select("h_a", "h_b")
      .distinct() // a close pair collides in several clean bands
      .withColumn("dist",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int"))
      .filter(col("dist") <= maxDist)
    cross.unionByName(
      hv.select(col("h").as("h_a"), col("h").as("h_b"), lit(0).as("dist")))
  }

  /** All pairs (id_a < id_b) with popcount(h_a xor h_b) ≤ maxDist.
    * Returns (id_a, id_b, h_a, h_b, dist). Requires maxDist < bands. */
  def selfPairs(df: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int, maxDist: Int): DataFrame = {
    val ids = df.select(col(idCol), col(hashCol))
    val vp = valuePairs(ids.select(col(hashCol).as("h")), bits, bands, maxDist)
    // expansion to id pairs: each unordered hash pair appears once and
    // each id carries one hash, so no pair-level dedup is needed; the
    // equal-hash diagonal expands its row group with id_a < id_b, the
    // h_a < h_b pairs normalize ids with least/greatest
    val a = ids.select(col(idCol).as("__ia"), col(hashCol).as("h_a"))
    val b = ids.select(col(idCol).as("__ib"), col(hashCol).as("h_b"))
    vp.join(a, Seq("h_a")).join(b, Seq("h_b"))
      .filter((col("h_a") < col("h_b") && col("__ia") =!= col("__ib")) ||
        (col("h_a") === col("h_b") && col("__ia") < col("__ib")))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        when(col("__ia") < col("__ib"), col("h_a")).otherwise(col("h_b")).as("h_a"),
        when(col("__ia") < col("__ib"), col("h_b")).otherwise(col("h_a")).as("h_b"),
        col("dist"))
  }
}
