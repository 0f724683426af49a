package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the standard 4×
  * memory/bandwidth reduction for ANN corpora at scale (quantized vectors
  * ride the shuffle and the candidate scan; full-precision vectors are only
  * fetched for the final re-score).
  *
  * Per-vector symmetric scheme: scale = max(|x|); q_i = round(x_i·127 /
  * scale) ∈ [−127, 127]. Pure narrow-map arithmetic (transform/aggregate
  * HOFs, no UDF), IEEE-exact and engine-portable, so quantized codes and
  * reconstruction error both sit under the SQL oracle gate.
  */
object Quantization {

  /** Per-vector max-abs scale (0-safe: a zero vector quantizes to zeros
    * with scale 1 rather than dividing by zero).
    */
  def maxAbsScale(vec: Column): Column = {
    val m = array_max(transform(vec, x => abs(x.cast("double"))))
    when(m > 0, m).otherwise(lit(1.0))
  }

  /** int8 codes under [[maxAbsScale]]. */
  def quantize(vec: Column): Column = {
    val s = maxAbsScale(vec)
    transform(vec, x => round(x.cast("double") * 127.0 / s).cast("int"))
  }

  /** Root-mean-square reconstruction error of the round trip
    * (dequant = q·scale/127), folded left-to-right for cross-engine
    * summation parity.
    */
  def rmse(vec: Column): Column = {
    val s = maxAbsScale(vec)
    val sq = aggregate(
      transform(vec, x => {
        val d = x.cast("double") - round(x.cast("double") * 127.0 / s) * s / 127.0
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)
    sqrt(sq / size(vec))
  }

  /** Per-vector quantization report: scale, a checksum of the int8 codes
    * (sum of codes — proves bit-identical quantization without hauling 64
    * columns through the compare), and the reconstruction RMSE.
    *
    * The scale is materialized ONCE per row in its own projection and the
    * downstream lambdas reference the COLUMN: inlining the max-abs
    * expression into the per-element lambdas (the [[quantize]]/[[rmse]]
    * convenience shape) makes the interpreted HOF evaluator recompute the
    * O(d) scan for EVERY element — O(d²) per row, measured 623 s for the
    * sf0.1 corpus vs sub-second with the column reference. CollapseProject
    * keeps the split: it never inlines a non-cheap alias with multiple
    * consumers.
    */
  def report(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    Parallelism.spread(emb).select(col(idCol),
        transform(col(vecCol), _.cast("double")).as("__v"),
        maxAbsScale(col(vecCol)).as("scale"))
      .select(col(idCol), col("scale"),
        aggregate(
          transform(col("__v"), x => round(x * 127.0 / col("scale")).cast("long")),
          lit(0L), (acc, q) => acc + q).as("code_sum"),
        round(rmseGivenScale(col("__v"), col("scale")), 9).as("rmse_r"))
  }

  /** [[rmse]] with the per-row scale supplied as a column (no per-element
    * recompute); same IEEE chain as [[rmse]].
    */
  private def rmseGivenScale(v: Column, s: Column): Column = {
    val sq = aggregate(
      transform(v, x => {
        val d = x - round(x * 127.0 / s) * s / 127.0
        d * d
      }),
      lit(0.0), (acc, e) => acc + e)
    sqrt(sq / size(v))
  }
}
