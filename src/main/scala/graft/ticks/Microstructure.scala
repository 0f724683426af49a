package graft.ticks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Trade-classification microstructure: the tick-rule signing chain
  * (Lee–Ready's fallback when no quote is available — up-tick ⇒ buy,
  * down-tick ⇒ sell, zero-tick carries the last decided side), order-flow
  * imbalance rollups, and Kyle's λ (price impact per unit of signed
  * flow) as a composition onto the exact-moment [[graft.operators
  * .Trend]] OLS. Everything before the one OLS division is exact
  * integers over per-symbol ordered windows.
  */
object Microstructure {

  /** Adds (delta, side): delta = price − previous price per symbol;
    * side ∈ {1, −1, null} via the tick rule with zero-tick carry-forward
    * (null until the first non-zero tick). */
  def tickSign(df: DataFrame, symCol: String, orderCols: Seq[String],
      priceCol: String): DataFrame = {
    val w = W.partitionBy(col(symCol)).orderBy(orderCols.map(col): _*)
    val wRun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    val withDelta = df.withColumn("delta",
      col(priceCol) - lag(col(priceCol), 1).over(w))
    withDelta.withColumn("side",
      last(when(col("delta") > 0, 1).when(col("delta") < 0, -1),
        ignoreNulls = true).over(wRun))
  }

  /** Per (symbol, bucket) signed-volume rollup over tick-signed trades:
    * (buy_vol, sell_vol, imbalance, n_unsigned) — exact integers. */
  def flowImbalance(df: DataFrame, symCol: String, orderCols: Seq[String],
      priceCol: String, sizeCol: String, bucket: Column): DataFrame =
    tickSign(df, symCol, orderCols, priceCol)
      .groupBy(col(symCol), bucket.as("bucket"))
      .agg(
        sum(when(col("side") === 1, col(sizeCol)).otherwise(0L)).as("buy_vol"),
        sum(when(col("side") === -1, col(sizeCol)).otherwise(0L)).as("sell_vol"),
        sum(when(col("side") === 1, col(sizeCol))
          .when(col("side") === -1, -col(sizeCol)).otherwise(0L)).as("imbalance"),
        sum(when(col("side").isNull, 1L).otherwise(0L)).as("n_unsigned"))

  /** Kyle's λ per symbol: OLS slope of price change against signed size
    * (side·size) over the tick-signed stream — the per-security market
    * impact coefficient. Output: (symCol, n, slope, intercept, corr). */
  def kyleLambda(df: DataFrame, symCol: String, orderCols: Seq[String],
      priceCol: String, sizeCol: String): DataFrame = {
    val signed = tickSign(df, symCol, orderCols, priceCol)
      .filter(col("side").isNotNull && col("delta").isNotNull)
    graft.operators.Trend.ols(signed, Seq(symCol),
      x = col("side") * col(sizeCol), y = col("delta"))
  }
}
