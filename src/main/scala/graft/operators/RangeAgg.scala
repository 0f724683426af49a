package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window aggregate join: for every left row, the SUM (and
  * count) of right-side values in the half-open window
  * (leftOn − windowSize, leftOn] within the same key group — "total
  * view value in the 3 days before each purchase".
  *
  * The naive formulation is a range join (`l ⋈ r ON key AND r.t ∈
  * (l.t−w, l.t]`) followed by a groupBy — O(rows-in-window) fan-out per
  * left row, quadratic when windows are dense. This operator instead
  * uses the prefix-sum identity
  *
  *   sum((a, b]) = S(b) − S(a)
  *
  * where S is the right side's running sum: two backward as-of joins
  * ([[AsOfJoin.backward]], each one shuffle + ordered window) against
  * the cumulative series — O(|L|+|R|) rows end to end regardless of
  * window density. Right rows are pre-aggregated per (key, timestamp) so
  * tied timestamps carry one cumulative point (the as-of match is then
  * unambiguous).
  *
  * Values must be exact integers (scale your doubles to cents/millis
  * first) so the two cumulative probes difference exactly.
  */
object RangeAgg {

  /** @param left       probe rows
    * @param right      event rows to aggregate
    * @param keys       equi-join key columns (both sides)
    * @param leftOn     left time column (long epoch scale)
    * @param rightOn    right time column (same scale)
    * @param valueCol   right integer value column to sum
    * @param windowSize trailing window width in the time scale's units
    * @return left rows + (trail_sum, trail_cnt), zeros when the window
    *         is empty
    */
  def trailingSum(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftOn: String, rightOn: String, valueCol: String,
      windowSize: Column): DataFrame = {
    val perT = right
      .groupBy((keys.map(col) :+ col(rightOn).as("__rt")): _*)
      .agg(sum(col(valueCol)).as("__v"), count(lit(1)).as("__c"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__rt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perT
      .withColumn("__cs", sum(col("__v")).over(w))
      .withColumn("__cc", sum(col("__c")).over(w))
      .select((keys.map(col) :+ col("__rt") :+ col("__cs") :+ col("__cc")): _*)

    val atT = AsOfJoin.backward(left, cum, keys, leftOn, "__rt",
      rightCols = Seq("__cs", "__cc"))
      .withColumnRenamed("__cs", "__cs_hi").withColumnRenamed("__cc", "__cc_hi")
    val probeLo = atT.withColumn("__t_lo", col(leftOn) - windowSize)
    val atLo = AsOfJoin.backward(probeLo, cum, keys, "__t_lo", "__rt",
      rightCols = Seq("__cs", "__cc"))
    atLo.select(
      left.columns.map(col) :+
        (coalesce(col("__cs_hi"), lit(0L)) - coalesce(col("__cs"), lit(0L)))
          .as("trail_sum") :+
        (coalesce(col("__cc_hi"), lit(0L)) - coalesce(col("__cc"), lit(0L)))
          .as("trail_cnt"): _*)
  }
}
