package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-integer PCA over an embedding column — the dimensionality lens
  * a training-data pipeline needs (dataset drift, embedding-space
  * whitening, principal-direction outlier mining) built so every stage
  * is bit-replayable cross-engine:
  *
  *  1. One distributed pass computes the exact Gram/covariance numerator
  *     M_ij = n·Σxy − Σx·Σy over MILLI-quantized components. The d²
  *     pair expansion happens map-side via nested `transform` +
  *     one `explode` (no self-join, no shuffle of row pairs): with
  *     partial aggregation the shuffle carries only d² rows per
  *     partition, so the cost is the unavoidable n·d² multiply work,
  *     perfectly data-parallel. Sums accumulate as exact BIGINTs (< 2^53
  *     up to ~10⁸ rows at d=64); the final n·Σxy − Σx·Σy products are
  *     computed in decimal(38,0) — they grow ~n²·10⁶ and would wrap
  *     int64 near n≈3e6 rows if multiplied in BIGINT.
  *  2. The d×d matrix is dimension-sized, so power iteration runs on
  *     the driver in exact Long arithmetic: the matrix is first
  *     normalized to ≤10⁶ (one correctly-rounded IEEE division per
  *     cell — both operands < 2^53, so the quotient is deterministic),
  *     then FIXED-ROUND iterated from the uniform vector with
  *     re-quantization to ≤10³ after every multiply. No convergence
  *     test, no randomness — the same arithmetic replays in SQL CTEs.
  *  3. `project` applies the learned direction distributedly: one
  *     map-side exact integer dot product per row.
  *
  * Sign is pinned by the deterministic start vector (uniform +1), not by
  * a convention — both engines run the identical recurrence.
  */
object Pca {

  /** Exact covariance numerators M_ij = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ (BIGINT) over
    * milli-quantized components. Returns (i, j, m) — d² rows.
    */
  def covarianceMilli(emb: DataFrame, vecCol: String, dims: Int): DataFrame = {
    val q = emb.select(
      transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long")).as("v"))
    // map-side pair expansion: d² (i, j, x·y, xᵢ, xⱼ) structs per row.
    // Carrying xᵢ/xⱼ through the SAME aggregation folds the marginal sums
    // into each cell (Σxᵢ over rows is the same for every j), so the whole
    // covariance is ONE pass / ONE shuffle / ZERO joins — partial agg
    // shrinks the shuffle to d² rows per partition.
    val pairs = q.select(explode(flatten(
      transform(col("v"), (x, i) =>
        transform(col("v"), (y, j) =>
          struct(i.as("i"), j.as("j"), (x * y).as("xy"),
            x.as("xi"), y.as("xj")))))).as("p"))
      .select(col("p.i"), col("p.j"), col("p.xy"), col("p.xi"), col("p.xj"))
    // The SUMS stay < 2^53 up to ~10⁸ rows, but the PRODUCTS n·Σxy and
    // Σx·Σy grow ~n²·10⁶ and would silently wrap int64 near n≈3e6 rows —
    // so the final numerator is computed in decimal(38,0) and only the
    // (cancellation-shrunk) difference is cast back to BIGINT. The
    // covariance numerator itself is ~n²·var(x)·10⁶, which stays well
    // inside int64 for any corpus this quantization is meaningful on.
    val dec = "decimal(38,0)"
    pairs.groupBy("i", "j")
      .agg(sum("xy").as("sxy"), sum("xi").as("sxi"), sum("xj").as("sxj"),
        count(lit(1)).as("cnt"))
      .select(col("i"), col("j"),
        (col("cnt").cast(dec) * col("sxy").cast(dec) -
          col("sxi").cast(dec) * col("sxj").cast(dec)).cast("long").as("m"))
  }

  /** Fixed-round power iteration on the (dimension-sized) exact
    * covariance triples. Returns the loading vector, index → milli
    * weight in [−1000, 1000] with max |loading| = 1000.
    */
  def principalLoadingsMilli(spark: SparkSession, cov: DataFrame,
      dims: Int, rounds: Int = 3): DataFrame = {
    // d² = dimension-sized (4096 cells at d=64) — driver iteration is the
    // honest 100 TB shape: the DISTRIBUTED work is the covariance pass.
    val cells = cov.select("i", "j", "m").collect()
    val mat = Array.ofDim[Long](dims, dims)
    cells.foreach(r => mat(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val maxAbs = mat.flatten.map(math.abs).max.max(1L)
    // SQL round() is half-AWAY-FROM-ZERO; Java Math.round is floor(x+0.5)
    // — they differ on exact negative halves, so replay the SQL rule
    def rnd(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    // one correctly-rounded IEEE division per cell; operands < 2^53
    val c = mat.map(_.map(v => rnd(v.toDouble / maxAbs * 1e6)))
    var v = Array.fill(dims)(1000L)
    for (_ <- 0 until rounds) {
      val u = Array.tabulate(dims)(i =>
        (0 until dims).map(j => c(i)(j) * v(j)).sum)
      val uMax = u.map(math.abs).max.max(1L)
      v = u.map(x => rnd(x.toDouble / uMax * 1000))
    }
    import spark.implicits._
    v.zipWithIndex.map { case (l, i) => (i, l) }.toSeq
      .toDF("dim", "loading_milli")
  }

  /** End-to-end: covariance pass + fixed-round iteration. */
  def fitMilli(emb: DataFrame, vecCol: String, dims: Int,
      rounds: Int = 3): DataFrame =
    principalLoadingsMilli(emb.sparkSession,
      covarianceMilli(emb, vecCol, dims), dims, rounds)

  /** Distributed projection onto a loading vector: exact integer dot
    * product milli(x)·loading_milli per row (map-side; loadings are
    * dimension-sized and shipped as a literal array).
    */
  def project(emb: DataFrame, vecCol: String, idCol: String,
      loadingsMilli: Array[Long]): DataFrame = {
    val lit64 = array(loadingsMilli.map(lit): _*)
    emb.select(col(idCol),
      aggregate(
        zip_with(
          transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long")),
          lit64, (x, w) => x * w),
        lit(0L), (acc, t) => acc + t).as("score"))
  }
}
