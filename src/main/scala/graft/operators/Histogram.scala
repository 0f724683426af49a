package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable equal-width histograms + histogram-based quantile estimation —
  * the sketch complement of the exact quantile family (q72): bin counts are
  * plain integers that ADD under union (build per day/shard, fold by
  * summing, estimate from the folded state — never rescan history), and at
  * 100 TB the state per group is `bins` counters regardless of row count.
  *
  * Geometry contract: `lo`/`hi`/`binWidth` are LONGs on the caller's
  * integer-scaled value (cents/micros), with `hi − lo = bins · binWidth`.
  * Bin assignment is `floor((v − lo) / binWidth)` clamped to [0, bins−1] —
  * the double division of sub-2^53 integers is correctly rounded and ≥
  * 1/binWidth away from the next integer unless exactly on a boundary, so
  * both engines bin identically (q143 replays it).
  *
  * Quantile estimate: invert the cumulative histogram at rank t = q·n and
  * interpolate linearly inside the hit bin — standard equal-width
  * histogram estimation; error bounded by binWidth. Out-of-range values
  * clamp into the edge bins (documented: the estimate degrades at the
  * edges if the range is mis-chosen; profile first — q138).
  */
object Histogram {

  /** Long-form per-group histogram: (groupCols…, bin: long, n: long).
    * Absent bins are implicit zeros. One partially-aggregated groupBy.
    */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Long, binWidth: Long, bins: Int): DataFrame = {
    require(bins >= 1 && binWidth >= 1, "bins and binWidth must be positive")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val bin = least(greatest(
      floor((v - lo) / lit(binWidth.toDouble)).cast("long"), lit(0L)),
      lit((bins - 1).toLong))
    df.select(g :+ bin.as("bin"): _*)
      .groupBy(g :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates from a (possibly folded) histogram relation.
    * One output row per group and requested q: (groupCols…, q, est_micro).
    * The per-group window runs over ≤ `bins` rows — bounded state.
    */
  def quantileMicro(hist: DataFrame, groupCols: Seq[String],
      lo: Long, binWidth: Long, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("bin"))
    val cum = hist
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__before", col("__cum") - col("n"))
      .withColumn("__total", sum(col("n")).over(Window.partitionBy(g: _*)))
    val perQ = qs.map { q =>
      // rank t = q·n; the hit bin is the first with cum ≥ t (t = 0 lands
      // in the first non-empty bin); interpolate inside it
      val t = lit(q) * col("__total")
      val hit = col("__cum") >= t && col("__before") < t ||
        (t <= 0 && col("__before") === 0)
      val frac = (t - col("__before")) / col("n")
      val est = lit(lo.toDouble) +
        lit(binWidth.toDouble) * (col("bin") + greatest(frac, lit(0.0)))
      struct(lit(q).as("q"),
        when(hit, round(est * 1e6).cast("long")).as("est_micro"))
    }
    cum.select(g :+ explode(array(perQ: _*)).as("__e"): _*)
      .filter(col("__e.est_micro").isNotNull)
      .groupBy(g :+ col("__e.q").as("q"): _*)
      // if t falls exactly on a bin boundary two bins can match `hit`;
      // take the lower bin's estimate (they agree up to interpolation
      // endpoints — min is the deterministic pick)
      .agg(min(col("__e.est_micro")).as("est_micro"))
  }
}
