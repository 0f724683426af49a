package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** CUSUM change-point detection (Page 1954) over per-group ordered
  * series — the drift monitor a production feed needs: "did this
  * source's daily volume / quality score shift level?"
  *
  * The textbook recursion S_i = max(0, S_{i−1} + (x_i − k)) is not a
  * window function, but it has the exact closed form
  *
  *   S_i = P_i − min(0, min_{j≤i} P_j)        with P = prefix-sum(x − k)
  *
  * (and symmetrically N_i = max(0, max_{j≤i} P_j) − P_i for the downward
  * side), so the whole detector is two ordinary ordered-window
  * aggregates over EXACT integers — no UDAF, no recursion, replayable in
  * any SQL engine and partition-parallel per series at 100 TB.
  *
  * Values arrive milli-scaled (`valueMilliCol`, BIGINT); the reference
  * level k is the series' own mean (round(avg), engine-identical IEEE
  * division) and the alarm threshold is sigmaMult·√(k/1000)·1000 — a
  * Poisson-σ-proportional level, sqrt being IEEE-exact cross-engine.
  */
object ChangePoint {

  /** @return input rows plus (k_milli, s_pos_milli, s_neg_milli,
    *         flag_pos, flag_neg), one row per (group, order) point.
    */
  def cusum(df: DataFrame, groupCols: Seq[String], orderCol: String,
      valueMilliCol: String, sigmaMult: Double = 3.0): DataFrame = {
    val g = groupCols.map(col)
    val wAll = W.partitionBy(g: _*)
    val wOrd = wAll.orderBy(col(orderCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val k = round(avg(col(valueMilliCol)).over(wAll)).cast("long")
    val out = df
      .withColumn("k_milli", k)
      .withColumn("__p",
        sum(col(valueMilliCol) - col("k_milli")).over(wOrd))
      .withColumn("__pmin", least(lit(0L), min(col("__p")).over(wOrd)))
      .withColumn("__pmax", greatest(lit(0L), max(col("__p")).over(wOrd)))
      .withColumn("s_pos_milli", col("__p") - col("__pmin"))
      .withColumn("s_neg_milli", col("__pmax") - col("__p"))
      .withColumn("__h",
        round(lit(sigmaMult) * sqrt(col("k_milli") / lit(1000.0)) * 1000)
          .cast("long"))
    out
      .withColumn("flag_pos", col("s_pos_milli") > col("__h"))
      .withColumn("flag_neg", col("s_neg_milli") > col("__h"))
      .drop("__p", "__pmin", "__pmax", "__h")
  }
}
