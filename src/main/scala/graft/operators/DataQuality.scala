package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-level data-quality checks — the fraud/corruption screens
  * a lake runs over numeric fact columns:
  *
  *  - Benford first-digit audit: observed leading-digit counts against
    *  the Benford expectation log10(1+1/d). The expected probabilities
    *  are FIXED micro-integer literals (no runtime log), the deviation
    *  statistic is computed PER DIGIT with a single rounded division —
    *  no floating-point aggregate whose summation order could drift.
  *  - Herfindahl–Hirschman concentration: Σ shareᵢ² per group over
    *  integer weights, one double division at the end.
  *
  * Both are one hash aggregation over the facts — map-side combinable,
  * no windows, no second pass.
  */
object DataQuality {

  /** Benford micro-probabilities: round(log10(1 + 1/d)·10⁶), d = 1..9. */
  val BenfordMicro: Seq[Long] = Seq(
    301030L, 176091L, 124939L, 96910L, 79181L,
    66947L, 57992L, 51153L, 45757L)

  /** First-digit audit of a positive integer column. 9 rows: (digit,
    * obs, n, exp_micro = n·p_micro, dev_micro = round((obs·10⁶ −
    * exp_micro)² / (exp_micro·10⁶))) — dev is the χ² component scaled
    * so Σ dev_micro/10⁶ ≈ n·χ². Digit extraction is exact string math
    * (no log10 on doubles). */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val digits = df.select(value.cast("long").as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val expected = BenfordMicro.zipWithIndex.map { case (p, i) =>
      struct(lit(i + 1).as("digit"), lit(p).as("p_micro"))
    }
    val probs = df.sparkSession.range(1).select(
        explode(array(expected: _*)).as("e"))
      .select(col("e.digit"), col("e.p_micro"))
    val n = digits.agg(sum(col("obs")).as("n"))
    probs.join(digits, Seq("digit"), "left").crossJoin(broadcast(n)) // 9×1 rows
      .select(col("digit"), coalesce(col("obs"), lit(0L)).as("obs"), col("n"),
        (col("n") * col("p_micro")).as("exp_micro"))
      .withColumn("__d",
        (col("obs") * 1000000L - col("exp_micro")).cast("double"))
      .withColumn("dev_micro", // explicit product, not pow: exact squaring
        round(col("__d") * col("__d")
          / (col("exp_micro").cast("double") * 1e6)).cast("long"))
      .drop("__d")
  }

  /** HHI per group over non-negative integer weights: (groupCols, n,
    * total, hhi_micro = round(Σw² / (Σw)² · 10⁶)); groups with zero
    * total drop. */
  def hhi(df: DataFrame, groupCols: Seq[String], weight: Column): DataFrame =
    df.select(groupCols.map(col) :+ weight.cast("long").as("__w"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__w")).as("total"),
        sum(col("__w") * col("__w")).as("__sq"))
      .filter(col("total") > 0)
      .withColumn("hhi_micro",
        round(col("__sq").cast("double")
          / (col("total").cast("double") * col("total").cast("double")) * 1e6)
          .cast("long"))
      .drop("__sq")
}
