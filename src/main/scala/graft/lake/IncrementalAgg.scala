package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of materialized additive aggregates — the daily
  * update folds ONLY the new partition's aggregate into the stored rollup
  * (reference semantics: each daily run touches the current slice, never the
  * corpus; update/app.py's per-day processing). At 100 TB this is the
  * difference between an O(day) and an O(history) refresh.
  *
  * Correct for any commutative-monoid measures (counts, integer-cent sums,
  * min/max via the same mechanism with different combiners). The algebraic
  * guarantee — merge(agg(A), agg(B)) == agg(A ∪ B) — is exactly what the
  * oracle checks.
  */
object IncrementalAgg {

  /** Merge a delta rollup into the current rollup: full-outer join on
    * `keys`, component-wise sum of the additive `sumCols` (absent side
    * contributes zero). Output schema == input schema.
    */
  def merge(current: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val d = sumCols.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
    current.join(d, keys, "full_outer")
      .select(keys.map(col) ++ sumCols.map(c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c)): _*)
  }
}
