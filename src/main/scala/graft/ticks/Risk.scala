package graft.ticks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Historical risk measures over per-security P&L series — exact order
  * statistics, no sampling, no float quantile interpolation:
  *
  *   VaR_α  = the ⌈α·n⌉-th worst daily delta (empirical quantile of the
  *            integer cents P&L distribution)
  *   ES_α   = the exact integer sum/count of the deltas at or below that
  *            order statistic (expected shortfall without the division —
  *            callers divide once if they want the mean)
  *
  * Everything is per-key ordered windows (partition-parallel at 100 TB);
  * the quantile index ⌈α n⌉ is computed in INTEGER arithmetic
  * ((n·num + den − 1) div den), never via float ceil — `ceil(n*0.05)`
  * is off by one whenever n·0.05 rounds up to the next representable
  * double (n = 20k exactly hits this).
  */
object Risk {

  /** Per-group historical VaR/ES at α = num/den over the delta series of
    * `centsCol` (ordered by `orderCol`). Output one row per group:
    * (n_deltas, var_cents, es_sum_cents, es_n). `var_cents` is the
    * ⌈α·n⌉-th SMALLEST delta — losses are negative deltas, so this is
    * the loss threshold; es_* aggregate the tail at or below it.
    */
  def historicalVar(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String, alphaNum: Int = 5, alphaDen: Int = 100): DataFrame = {
    val wOrd = W.partitionBy(col(groupCol)).orderBy(col(orderCol))
    val deltas = df
      .withColumn("__d", col(centsCol) - lag(col(centsCol), 1).over(wOrd))
      .filter(col("__d").isNotNull)
    val wAsc = W.partitionBy(col(groupCol))
      .orderBy(col("__d").asc, col(orderCol).asc) // total order: ties by day
    val wAll = W.partitionBy(col(groupCol))
    val ranked = deltas
      .withColumn("__rn", row_number().over(wAsc))
      .withColumn("__n", count(lit(1)).over(wAll))
      // ⌈α·n⌉ in pure integers (SQL `div`, not float division)
      .withColumn("__k",
        expr(s"(__n * $alphaNum + ${alphaDen - 1}) div $alphaDen")
          .cast("long"))
    ranked.groupBy(col(groupCol))
      .agg(
        max(col("__n")).as("n_deltas"),
        max(when(col("__rn") === col("__k"), col("__d"))).as("var_cents"),
        sum(when(col("__rn") <= col("__k"), col("__d"))).as("es_sum_cents"),
        sum(when(col("__rn") <= col("__k"), 1L).otherwise(0L)).as("es_n"))
  }
}
