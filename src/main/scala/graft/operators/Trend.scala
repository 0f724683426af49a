package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group closed-form least-squares trend and correlation — the
  * feature-extraction shape for "slope of y over time per entity" (price
  * drift per symbol, engagement trend per user, quality drift per source)
  * computed as ONE partial-aggregable pass.
  *
  * All five moments (n, Σx, Σy, Σxy, Σxx[, Σyy]) are exact INTEGER sums:
  * map-side-combinable, shuffle-light (one row per group), and — because
  * every downstream double is derived from integers below 2^53 through
  * correctly-rounded IEEE ops in a fixed expression order — bit-exact
  * reproducible across engines (the DuckDB oracle replays the same
  * formula and hashes identically; the same trick as ExactAgg's cents
  * sums, extended to second moments).
  *
  * Caller contract: x and y must be integer-valued columns scaled so the
  * worst-case |n·Σxy| stays under 2^63 (center x around a fixed epoch,
  * scale y to cents). At 100 TB this is a single hash aggregation —
  * no window, no sort, no second pass.
  */
object Trend {

  /** OLS slope/intercept + Pearson r per group. Groups with zero x (or y)
    * variance are dropped (their trend is undefined).
    * Output: groupCols ++ (n, slope, intercept, corr).
    */
  def ols(df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    val m = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xl).as("sx"), sum(yl).as("sy"),
      sum(xl * yl).as("sxy"), sum(xl * xl).as("sxx"), sum(yl * yl).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = num / denX.cast("double")
    m.filter(denX > 0 && denY > 0)
      .withColumn("slope", slope)
      .withColumn("intercept",
        (col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double"))
      // den_x·den_y as a long product can overflow where the factors do
      // not — take sqrts first (exact-integer → correctly-rounded double)
      .withColumn("corr",
        num / (sqrt(denX.cast("double")) * sqrt(denY.cast("double"))))
      .select((groupCols.map(col) ++ Seq(col("n"), col("slope"),
        col("intercept"), col("corr"))): _*)
  }
}
