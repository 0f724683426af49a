package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity resolution / record linkage: dirty probe records matched against
  * a clean reference by blocking + edit-distance scoring — the classic
  * three-stage shape (block, score, pick) that keeps pairwise string
  * comparison OFF the n² path.
  *
  *  1. BLOCK: probes and references are keyed by a caller-supplied
  *     blocking function of the name (a perturbation-stable substring,
  *     phonetic code, length band, …); only same-block pairs are scored.
  *  2. SCORE: Levenshtein distance (Spark's codegen'd `levenshtein`)
  *     on each candidate pair, thresholded at `maxDistance`.
  *  3. PICK: per probe, the candidate with minimal distance, ties to the
  *     smallest reference id — one key-partitioned window at probe
  *     granularity, no global sort.
  *
  * Unmatched probes survive with a null match (left semantics): a real
  * linkage pipeline routes those to fuzzy escalation or human review.
  *
  * Scale posture: the only join is the equi-join on the block key, so the
  * candidate count is Σ|block_probes|·|block_refs| — the caller's
  * blocking function is the lever; with sane blocks this is ~linear in
  * probes. The pick window partitions by probe id (no skew beyond block
  * fan-out); nothing collects, nothing is cartesian.
  */
object RecordLinkage {

  /** Link `probes(probeId, probeName)` to `refs(refId, refName)`.
    * Output: (probeId, refId-as-matched_id nullable, distance nullable,
    * n_candidates) — one row per probe.
    */
  def link(probes: DataFrame, refs: DataFrame,
      probeId: String, probeName: String,
      refId: String, refName: String,
      blockKey: Column => Column, maxDistance: Int): DataFrame = {
    val p = probes.select(col(probeId).as("__pid"), col(probeName).as("__pname"),
      blockKey(col(probeName)).as("__bk"))
    val r = refs.select(col(refId).as("__rid"), col(refName).as("__rname"),
      blockKey(col(refName)).as("__bk"))
    val scored = p.join(r, Seq("__bk"))
      .withColumn("__dist", levenshtein(col("__pname"), col("__rname")))
      .filter(col("__dist") <= maxDistance)
    val pick = Window.partitionBy(col("__pid"))
      .orderBy(col("__dist").asc, col("__rid").asc)
    val best = scored
      .withColumn("__rn", row_number().over(pick))
      .withColumn("__nc", count(lit(1)).over(Window.partitionBy(col("__pid"))))
      .filter(col("__rn") === 1)
      .select(col("__pid"), col("__rid").as("matched_id"),
        col("__dist").as("distance"), col("__nc").as("n_candidates"))
    p.select(col("__pid")).distinct()
      .join(best, Seq("__pid"), "left")
      .select(col("__pid").as(probeId), col("matched_id"), col("distance"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }
}
