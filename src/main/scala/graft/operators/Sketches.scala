package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the classic sub-linear frequency
  * summary for heavy-hitter queries at corpus scale: `depth` independent
  * hash rows × `width` counters; estimate(x) = min over rows of the counter
  * x hashes into. Always an OVERestimate (collisions only add), with error
  * ≤ 2N/width at probability 1 − (1/2)^depth.
  *
  * Scale shape: the sketch build is ONE partially-aggregated groupBy over
  * (row, bucket) — depth rows per input key, map-side combined — and the
  * finished sketch is `depth × width` counters: kilobytes, broadcastable,
  * mergeable across shards by plain addition (counter-wise sum), which is
  * why real pipelines build per-partition sketches and fold them.
  *
  * Hashes are md5-derived with the row index salted into the input
  * (engine-portable, like [[graft.text.TextFunctions.portableTokenHash]]),
  * so an external engine regenerates the identical sketch and the whole
  * operator sits under the exact-hash oracle (q92) — no RNG, no seed state.
  */
object Sketches {

  /** 32-bit md5-derived hash of `key` salted with the hash-row index. */
  private def rowHash(key: Column, row: Int): Column = {
    val m = md5(concat(lit(s"$row:"), key.cast("string")).cast("binary"))
    conv(substring(m, 1, 8), 16, 10).cast("long")
  }

  /** All depth (r, bucket) cells of one key as an exploded struct array —
    * ONE pass over the input (a union of depth scans would re-read and
    * re-tokenize the corpus depth times).
    */
  private def cells(key: Column, width: Int, depth: Int): Column =
    explode(array((0 until depth).map { r =>
      struct(lit(r).as("r"), (rowHash(key, r) % width).as("b"))
    }: _*))

  /** Build: one row per (hash row r, bucket b) with the collision-summed
    * count — a single scan and one partially-aggregated groupBy. Missing
    * (r, b) combinations are zero counters (left implicit — estimates
    * treat absent buckets as 0 via the probe join).
    */
  def cmsBuild(df: DataFrame, keyCol: String, width: Int, depth: Int): DataFrame =
    df.select(cells(col(keyCol), width, depth).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Estimate the frequency of each probe key: min over hash rows of the
    * counter it lands in. The sketch side is broadcast (depth × width
    * counters); probes are only mapped and locally aggregated.
    */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame =
    probes.select(col(keyCol), cells(col(keyCol), width, depth).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cms), Seq("r", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))
}
