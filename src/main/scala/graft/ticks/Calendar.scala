package graft.ticks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trading-calendar alignment (J5 — reference utils/mapping.py:24-88,
  * utils/calendar.py:32-55): left-join per-security bars onto the
  * trading-day spine so halts/IPO gaps surface as null OHLCV rows, which is
  * exactly the shape the reference stores (P4 drops them again at update
  * time, update/app.py:385-393).
  */
object Calendar {

  /** Weekday spine [start, end] as a single-column `date` DataFrame.
    * The reference fetches the real NYSE calendar once from Alpaca
    * (calendar.py:92-130); offline we approximate with weekdays, and accept
    * any externally supplied calendar DataFrame in [[align]].
    */
  def weekdaySpine(spark: SparkSession, start: String, end: String): DataFrame =
    spark.sql(
      s"""SELECT explode(sequence(DATE'$start', DATE'$end', INTERVAL 1 DAY)) AS date""")
      .filter(dayofweek(col("date")).between(2, 6))

  /** Weekday spine derived from a one-row (lo, hi) date-bounds relation —
    * fully declarative: no driver `.collect()` pre-pass, so the bounds
    * aggregation stays inside the same job (and its input subtree is
    * exchange-reused rather than re-scanned).
    */
  def weekdaySpineFromBounds(bounds: DataFrame): DataFrame =
    bounds.select(explode(sequence(col("lo"), col("hi"))).as("date"))
      .filter(dayofweek(col("date")).between(2, 6))

  /** Calendar-align bars: for every (security_id, trading day) emit a row;
    * non-traded days carry null OHLCV. `bars` must have (security_id, date,
    * ...); spine has (date). Broadcast the spine (it's tiny) and cross it
    * with the per-security date bounds — no shuffle of the fact side beyond
    * its own partitioning.
    */
  def align(bars: DataFrame, spine: DataFrame): DataFrame = {
    val bounds = bars.groupBy(col("security_id"))
      .agg(min(col("date")).as("__first"), max(col("date")).as("__last"))
    val grid = bounds.join(broadcast(spine),
        col("date").between(col("__first"), col("__last")))
      .select(col("security_id"), col("date"))
    grid.join(bars, Seq("security_id", "date"), "left")
  }

  /** P4 — drop rows where ALL of the given columns are null
    * (update/app.py:385-393).
    */
  def dropAllNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("all", cols)
}
