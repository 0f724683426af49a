package graft.ticks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Cross-sectional momentum backtest — the composite read pattern a quant
  * datalake serves end to end: per-security trailing momentum (ordered
  * window), per-day cross-sectional rank (day-partitioned window — never
  * global), top-k portfolio selection, and next-period P&L attribution.
  * All integer cents; the only windows are keyed by security or by day,
  * so every stage is partition-parallel at 100 TB.
  */
object Backtest {

  /** @param close one row per (group, day) with integer `centsCol`
    * @return per-day portfolio rows: (dayCol, n_selected, pnl_cents,
    *         best_cents, worst_cents) for days where a full lookback and
    *         a forward period exist. Selection: top `k` by trailing
    *         `lookback`-row delta (ties → lower group id wins).
    */
  /** Long–short decile-style backtest: long the top `k`, short the
    * bottom `k` by trailing momentum each day, next-period spread P&L
    * plus the CUMULATIVE curve — the cumulative prefix sum runs through
    * [[graft.operators.GlobalOrder.runningSum]] (day-level relation,
    * but the no-single-partition-window rule is absolute).
    * Output: (dayCol, n_long, n_short, spread_cents, cum_spread_cents).
    */
  def longShortTopK(close: DataFrame, groupCol: String, dayCol: String,
      centsCol: String, lookback: Int = 5, k: Int = 10): DataFrame = {
    val wSid = W.partitionBy(col(groupCol)).orderBy(col(dayCol))
    val enriched = close
      .withColumn("__mom", col(centsCol) - lag(col(centsCol), lookback).over(wSid))
      .withColumn("__fwd", lead(col(centsCol), 1).over(wSid) - col(centsCol))
      .filter(col("__mom").isNotNull && col("__fwd").isNotNull)
    val wTop = W.partitionBy(col(dayCol))
      .orderBy(col("__mom").desc, col(groupCol).asc)
    val wBot = W.partitionBy(col(dayCol))
      .orderBy(col("__mom").asc, col(groupCol).desc)
    val daily = enriched
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__rb", row_number().over(wBot))
      .filter(col("__rt") <= k || col("__rb") <= k)
      .groupBy(col(dayCol))
      .agg(
        sum(when(col("__rt") <= k, 1L).otherwise(0L)).as("n_long"),
        sum(when(col("__rb") <= k, 1L).otherwise(0L)).as("n_short"),
        sum(when(col("__rt") <= k, col("__fwd")).otherwise(0L)).as("__pl"),
        sum(when(col("__rb") <= k, -col("__fwd")).otherwise(0L)).as("__ps"))
      .withColumn("spread_cents", col("__pl") + col("__ps"))
    graft.operators.GlobalOrder
      .runningSum(daily, Seq(dayCol), col("spread_cents"), "cum_spread_cents")
      .drop("__pl", "__ps")
  }

  def momentumTopK(close: DataFrame, groupCol: String, dayCol: String,
      centsCol: String, lookback: Int = 5, k: Int = 10): DataFrame = {
    val wSid = W.partitionBy(col(groupCol)).orderBy(col(dayCol))
    val enriched = close
      .withColumn("__mom", col(centsCol) - lag(col(centsCol), lookback).over(wSid))
      .withColumn("__fwd", lead(col(centsCol), 1).over(wSid) - col(centsCol))
      .filter(col("__mom").isNotNull && col("__fwd").isNotNull)
    val wDay = W.partitionBy(col(dayCol))
      .orderBy(col("__mom").desc, col(groupCol).asc)
    enriched
      .withColumn("__rk", row_number().over(wDay))
      .filter(col("__rk") <= k)
      .groupBy(col(dayCol))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("__fwd")).as("pnl_cents"),
        max(col("__fwd")).as("best_cents"),
        min(col("__fwd")).as("worst_cents"))
  }
}
