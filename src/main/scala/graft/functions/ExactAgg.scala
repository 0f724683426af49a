package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregation helpers engineered for bit-identical results across engines
  * (Spark vs a DuckDB oracle) and across partitionings/row orders.
  *
  * Floating-point summation is order-dependent; on a 1000-executor cluster the
  * reduction order is nondeterministic, so `sum(double)` is not reproducible.
  * Money-like columns in the lake carry fixed decimal precision (the reference
  * stores OHLCV rounded to 4dp — see reference storage/pipeline/collectors.py:53-60),
  * so we sum them as scaled integers (exact, associative, commutative) and
  * rescale once at the end. This is both a correctness-parity and a
  * determinism-at-scale tool.
  */
object ExactAgg {

  /** Order-independent exact sum of a fixed-point column.
    * `fixedSum(c, 2)` == SQL `sum(CAST(round(c*100) AS BIGINT))/100.0`.
    * Safe while sum(|c|)*10^scale < 2^63.
    */
  def fixedSum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / f
  }

  /** Order-independent mean of a fixed-point column: (sum_scaled/10^s)/n. */
  def fixedAvg(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    (sum(round(c * f).cast("long")) / f) / count(lit(1))
  }

  /** Exact sample variance of a fixed-point column via integer sums:
    * (sumsq - sum^2/n) / (n-1), all moments accumulated as longs.
    * Deterministic under any aggregation order (unlike Welford streaming).
    */
  def fixedVarSamp(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    val s = sum(round(c * f).cast("long"))
    val s2 = sum((round(c * f).cast("long")) * (round(c * f).cast("long")))
    val n = count(lit(1))
    (s2.cast("double") - s.cast("double") * s.cast("double") / n) /
      (f * f) / (n - 1)
  }

  /** Exact sample stddev from [[fixedVarSamp]]. */
  def fixedStddevSamp(c: Column, scale: Int): Column =
    sqrt(fixedVarSamp(c, scale))
}
