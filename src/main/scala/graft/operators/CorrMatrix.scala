package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation MATRIX over k integer-scaled columns in
  * ONE pass — the feature-QA companion to [[Trend]] (which does per-group
  * x→y): k first moments, k second moments, and k·(k−1)/2 cross moments
  * all accumulate in a single aggregate row, then unpivot driver-free into
  * (col_x, col_y, corr) long form.
  *
  * Moments are exact decimal(38,0) sums (the Funnel HUGEINT-parity trick):
  * per-row products must fit int64 (caller scales columns accordingly —
  * cents/basis points), but the SUMS may exceed it freely — decimal
  * accumulation is exact, order-free, and matches DuckDB's HUGEINT sum
  * semantics, so the whole moment state replays bit-exact and the final
  * double chain (cast, subtract — exact integers — divide, sqrt) is
  * engine-identical. Zero-variance columns yield null correlations rather
  * than NaN.
  *
  * Scale: one partially-aggregated scan, k²/2 counters of state, no
  * shuffle beyond the single-row aggregate — the cheapest possible shape
  * for a 100 TB correlation screen.
  */
object CorrMatrix {

  /** @param cols (name, integer-valued column) — pre-scaled so per-row
    *             squares/products fit int64
    * @return one row per unordered pair (i < j in the given order):
    *         (col_x, col_y, n, corr) with corr null when either side has
    *         zero variance
    */
  def pearson(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val named = cols.map { case (nm, c) => nm -> c.cast("long") }
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val idxPairs = for { i <- named.indices; j <- named.indices if i < j }
      yield (i, j)
    val aggs = named.flatMap { case (nm, c) =>
      Seq(sum(dec(c)).as(s"__s_$nm"), sum(dec(c * c)).as(s"__ss_$nm"))
    } ++ idxPairs.map { case (i, j) =>
      sum(dec(named(i)._2 * named(j)._2)).as(s"__sp_${named(i)._1}__${named(j)._1}")
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = idxPairs.map { case (i, j) =>
      val (ni, _) = named(i); val (nj, _) = named(j)
      val n = col("__n")
      val num = (n * col(s"__sp_${ni}__$nj") -
        col(s"__s_$ni") * col(s"__s_$nj")).cast("double")
      val dx = (n * col(s"__ss_$ni") -
        col(s"__s_$ni") * col(s"__s_$ni")).cast("double")
      val dy = (n * col(s"__ss_$nj") -
        col(s"__s_$nj") * col(s"__s_$nj")).cast("double")
      struct(lit(ni).as("col_x"), lit(nj).as("col_y"), n.as("n"),
        when(dx > 0 && dy > 0, num / (sqrt(dx) * sqrt(dy))).as("corr"))
    }
    wide.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }
}
