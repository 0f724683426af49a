package graft.fundamental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.SafeArith._

/** The 24 derived fundamental metrics over TTM data.
  *
  * Formulas and null semantics follow reference derived/metrics.py:17-250
  * exactly: safe_* helpers null-propagate and null on division-by-zero;
  * the lag-based metrics (avg_ast/avg_eqt via lag-4 year-over-year on
  * quarterly rows, rev_grw/ast_grw/wc_acc via lag-1) use PLAIN arithmetic
  * (nulls propagate identically).
  *
  * Input: TTM long (symbol, as_of_date, concept, value).
  * Output: metrics long (symbol, as_of_date, metric, value), nulls dropped.
  *
  * Spark shape: pivot → one windowed pass per symbol → unpivot. A single
  * shuffle on symbol; every formula is a codegen'd Column expression.
  */
object DerivedMetrics {

  val requiredInputs: Seq[String] = Seq(
    "rev", "cor", "op_inc", "net_inc", "dna",
    "std", "ltd", "cce", "ca", "cl",
    "cfo", "capex", "ta", "te",
    "inc_tax_exp", "ibt")

  val metricNames: Seq[String] = Seq(
    "grs_pft", "grs_mgn", "op_mgn", "net_mgn", "ebitda",
    "ttl_dbt", "net_dbt", "wc",
    "fcf", "fcf_mgn", "capex_ratio",
    "avg_ast", "avg_eqt", "etr", "roa", "roe", "nopat", "inv_cap", "roic",
    "rev_grw", "ast_grw", "inv_rt",
    "acc", "wc_acc")

  /** EAV long → wide on concept (A7). Values are unique per
    * (symbol, as_of_date, concept) post-TTM; `first` matches the reference's
    * pivot aggregate (metrics.py:76-81) — we use max for determinism.
    */
  def pivotWide(ttmLong: DataFrame): DataFrame =
    ttmLong.groupBy(col("symbol"), col("as_of_date"))
      .pivot("concept")
      .agg(max(col("value")))

  def compute(ttmLong: DataFrame): DataFrame = {
    val wide0 = pivotWide(ttmLong)
    // Ensure every required input column exists (missing concepts → null).
    val wide = requiredInputs.foldLeft(wide0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast("double"))
    }
    computeWide(wide).select(col("symbol"), col("as_of_date"),
        expr(s"stack(${metricNames.size}, " +
          metricNames.map(m => s"'$m', $m").mkString(", ") + ") as (metric, value)"))
      .filter(col("value").isNotNull)
  }

  /** The 24 metric columns over a wide TTM frame. Exposed for testing and
    * for callers that want the wide shape.
    */
  def computeWide(wide: DataFrame): DataFrame = {
    val bySymbol = Window.partitionBy(col("symbol")).orderBy(col("as_of_date"))
    def lagN(c: String, n: Int): Column = lag(col(c), n).over(bySymbol)

    wide
      // 1. profitability
      .withColumn("grs_pft", safeSubtract(col("rev"), col("cor")))
      .withColumn("grs_mgn", safeDivide(col("grs_pft"), col("rev")))
      .withColumn("op_mgn", safeDivide(col("op_inc"), col("rev")))
      .withColumn("net_mgn", safeDivide(col("net_inc"), col("rev")))
      .withColumn("ebitda", safeAdd(col("op_inc"), col("dna")))
      // 2. balance-sheet constructs
      .withColumn("ttl_dbt", safeAdd(col("std"), col("ltd")))
      .withColumn("net_dbt", safeSubtract(col("ttl_dbt"), col("cce")))
      .withColumn("wc", safeSubtract(col("ca"), col("cl")))
      // 3. cash flow
      .withColumn("fcf", safeSubtract(col("cfo"), col("capex")))
      .withColumn("fcf_mgn", safeDivide(col("fcf"), col("rev")))
      .withColumn("capex_ratio", safeDivide(col("capex"), col("ta")))
      // 4. returns — lag-4 = year-over-year on quarterly TTM rows (W2)
      .withColumn("avg_ast", (col("ta") + lagN("ta", 4)) / 2)
      .withColumn("avg_eqt", (col("te") + lagN("te", 4)) / 2)
      .withColumn("etr", safeDivide(col("inc_tax_exp"), col("ibt")))
      .withColumn("roa", safeDivide(col("net_inc"), col("avg_ast")))
      .withColumn("roe", safeDivide(col("net_inc"), col("avg_eqt")))
      .withColumn("nopat", safeMultiply(col("op_inc"), lit(1) - col("etr")))
      .withColumn("inv_cap", safeSubtract(safeAdd(col("te"), col("ttl_dbt")), col("cce")))
      .withColumn("roic", safeDivide(col("nopat"), col("inv_cap")))
      // 5. growth (W1: lag-1)
      .withColumn("rev_grw", col("rev") - lagN("rev", 1))
      .withColumn("ast_grw", col("ta") - lagN("ta", 1))
      .withColumn("inv_rt", safeDivide(col("capex"), col("ta")))
      // 6. accruals
      .withColumn("acc", safeSubtract(col("net_inc"), col("cfo")))
      .withColumn("wc_acc", safeSubtract(col("wc") - lag(col("wc"), 1).over(bySymbol), col("dna")))
  }
}
