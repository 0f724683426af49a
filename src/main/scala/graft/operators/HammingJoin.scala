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
  */
object HammingJoin {

  /** All pairs (id_a < id_b) with popcount(h_a xor h_b) ≤ maxDist.
    * Returns (id_a, id_b, h_a, h_b, dist). Requires maxDist < bands. */
  def selfPairs(df: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int, maxDist: Int): DataFrame = {
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
    val slices: Seq[Column] = (0 until bands).map { b =>
      val lo = b * w
      val width = math.max(0, math.min(w, bits - lo))
      struct(lit(b).as("band"),
        shiftrightunsigned(col(hashCol), lo)
          .bitwiseAND(lit((1L << width) - 1)).as("bv"))
    }
    val banded = df
      .select(col(idCol), col(hashCol), explode(array(slices: _*)).as("bb"))
      .select(col(idCol), col(hashCol),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.select(col(idCol).as("id_a"), col(hashCol).as("h_a"),
      col("band"), col("bv"))
    val b = banded.select(col(idCol).as("id_b"), col(hashCol).as("h_b"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b")
      .distinct() // a close pair collides in several clean bands
      .withColumn("dist", bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int"))
      .filter(col("dist") <= maxDist)
  }
}
