package graft.fundamental

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Schemas

/** Trailing-twelve-months rollup over EAV fundamentals.
  *
  * Reference semantics (derived/ttm.py:111-147): per (symbol, concept),
  * order rows by as_of_date and sum each run of 4 consecutive rows; emit one
  * TTM row per complete window carrying the LAST row's as_of_date/accn/form/
  * frame/end and the FIRST row's start. Only duration (flow) concepts roll;
  * instant concepts pass through separately (see [[attachInstant]]).
  *
  * Spark shape: one shuffle on (symbol, concept), sort-window `rowsBetween
  * (-3, 0)` — partial windows filtered by in-window row count. Scales as a
  * single windowed pass; no self-joins.
  */
object Ttm {

  def compute(raw: DataFrame,
      durationConcepts: Set[String] = Schemas.durationConcepts): DataFrame = {
    val filtered = raw
      .filter(col("concept").isin(durationConcepts.toSeq: _*))
      .filter(col("value").isNotNull && col("as_of_date").isNotNull && col("frame").isNotNull)

    // Total order within the group for cluster determinism (the reference
    // sorts by as_of_date only; (end, accn) is our deterministic tiebreak —
    // SURVEY §7.5 risk 3).
    val w = Window.partitionBy(col("symbol"), col("concept"))
      .orderBy(col("as_of_date"), col("end"), col("accn"))
      .rowsBetween(-3, 0)

    filtered
      .withColumn("__ttm_value", sum(col("value")).over(w))
      .withColumn("__ttm_start", first(col("start")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === 4)
      .select(
        col("symbol"), col("as_of_date"), col("accn"), col("form"),
        col("concept"),
        col("__ttm_value").as("value"),
        col("__ttm_start").as("start"),
        col("end"), col("frame"))
  }

  /** Backward as-of join of the latest instant (balance-sheet) concepts onto
    * each TTM observation date, per symbol (J4 — reference collectors.py:764-784
    * uses polars join_asof strategy="backward").
    *
    * `instantWide`: (symbol, as_of_date, <concept cols>) wide frame of
    * instant concepts. Returns ttm rows + the instant columns as-of each
    * ttm as_of_date.
    */
  def attachInstant(ttmWide: DataFrame, instantWide: DataFrame): DataFrame = {
    val valueCols = instantWide.columns.filterNot(Seq("symbol", "as_of_date").contains)
    graft.operators.AsOfJoin.backward(
      left = ttmWide,
      right = instantWide,
      keys = Seq("symbol"),
      leftOn = "as_of_date",
      rightOn = "as_of_date",
      rightCols = valueCols.toSeq)
  }
}
