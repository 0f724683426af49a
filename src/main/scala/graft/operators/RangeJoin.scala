package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join for the case q10's broadcast cannot handle:
  * BOTH sides too large to broadcast and no selective equality key.
  *
  * A naive `points.join(intervals, p.between(s, e))` has no equi-condition,
  * so Spark plans a BroadcastNestedLoopJoin (driver/executor OOM once the
  * build side outgrows memory) or a cartesian product — O(n·m) compares at
  * cluster scale. Binning restores a hash-joinable equality key:
  *
  *  - each interval [s, e] explodes to its covering bins
  *    floor(s/W) .. floor(e/W) — at most (len/W)+2 rows, ~2-3 when the bin
  *    width W is chosen near the typical interval length;
  *  - each point p maps to exactly ONE bin floor(p/W);
  *  - the join runs as a standard shuffled/broadcast HASH join on the bin
  *    key with the BETWEEN kept as a residual filter.
  *
  * A point lands in one bin and an interval appears at most once per bin,
  * so no duplicate pairs are produced and no dedup pass is needed. This is
  * the published range-join bin optimization (Databricks range-join hints;
  * DuckDB's IEJoin is the sort-based alternative). Reference shape: the
  * filing-date window filter joined at scale
  * (`collection/fundamental.py:516-535` applies it per-symbol in a loop).
  *
  * Columns must be integral (e.g. days since an epoch). Bin ids are computed
  * with floating floor(x/W): exact for |x| < 2^53, far beyond any date/epoch
  * domain.
  */
object RangeJoin {

  /** Inner-join `points` (pointCol) to `intervals` ([startCol, endCol],
    * both inclusive) with bin width `binWidth`. Output = all point-interval
    * containment matches with columns from both inputs.
    */
  def binnedPointInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    val binned = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(floor(col(startCol) / w).cast("long"),
          floor(col(endCol) / w).cast("long"))))
    points
      .withColumn("__bin", floor(col(pointCol) / w).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
