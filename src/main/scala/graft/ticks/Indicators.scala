package graft.ticks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Technical-indicator family over per-security ordered price series —
  * the daily-bar derived metrics a quant datalake serves next to raw
  * ticks (the reference stops at OHLC bars, `storage/clients/ticks.py`;
  * these are the standard downstream transforms of those bars).
  *
  * Every indicator here is a plain per-group ordered-window aggregate
  * over EXACT integer cents — partition-parallel per security at 100 TB
  * (no global window, no driver state), hash-replayable in any SQL
  * engine:
  *
  *  - drawdown: running peak via `max() OVER (rows unbounded preceding)`;
  *    the running max-drawdown is a second running max over the integer
  *    peak−price gap. No recursion needed.
  *  - EWMA: the usual α-recursion is replaced by a DYADIC kernel
  *    (α = 1/2) over a bounded W-row window, unrolled as W `lag`
  *    columns with integer weights 2^(W−1−j) — the weighted numerator
  *    and denominator are exact BIGINTs and the single final division is
  *    IEEE-identical cross-engine. Series heads (< W rows) renormalise
  *    over the lags actually present.
  *  - Bollinger breach: `price > mean + k·std` is decided ENTIRELY in
  *    integers — n·c − S > 0 ∧ (n·c − S)² > k²·(n·Q − S²) — so no sqrt
  *    ever runs and the flag cannot drift in the last ulp.
  *  - RSI (Cutler's variant): trailing-window gain/loss sums with a
  *    single 100·G/(G+L) division at the end.
  */
object Indicators {

  private def wOrd(groupCol: String, orderCol: String) =
    W.partitionBy(col(groupCol)).orderBy(col(orderCol))

  /** Per-row running peak / drawdown / max-drawdown in integer cents.
    * Adds (peak_cents, dd_cents, max_dd_cents). */
  def drawdown(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String): DataFrame = {
    val w = wOrd(groupCol, orderCol)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    df.withColumn("peak_cents", max(col(centsCol)).over(w))
      .withColumn("dd_cents", col("peak_cents") - col(centsCol))
      .withColumn("max_dd_cents", max(col("dd_cents")).over(w))
  }

  /** Per-security drawdown summary: worst drawdown, all-time peak, and
    * how many rows set a new peak (a proxy for trend persistence). */
  def drawdownSummary(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String): DataFrame =
    drawdown(df, groupCol, orderCol, centsCol)
      .groupBy(col(groupCol))
      .agg(
        max(col("dd_cents")).as("max_dd_cents"),
        max(col("peak_cents")).as("peak_cents"),
        sum(when(col(centsCol) === col("peak_cents"), 1L).otherwise(0L))
          .as("n_new_peaks"),
        count(lit(1)).as("n_obs"))

  /** Dyadic EWMA over the trailing `window` rows: weight 2^(W−1−j) for
    * lag j. Adds ewma_num / ewma_den (exact BIGINT) and `ewma` — the one
    * IEEE division, rounded to 9 places for cross-engine hashing. */
  def ewmaDyadic(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String, window: Int = 8): DataFrame = {
    val w = wOrd(groupCol, orderCol)
    val terms: Seq[(Column, Column)] = (0 until window).map { j =>
      val weight = 1L << (window - 1 - j)
      val l = lag(col(centsCol), j).over(w)
      (when(l.isNotNull, l * lit(weight)).otherwise(lit(0L)),
        when(l.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma_num", num.cast("long"))
      .withColumn("ewma_den", den.cast("long"))
      .withColumn("ewma",
        round(col("ewma_num").cast("double") / col("ewma_den") / 100.0, 9))
  }

  /** Bollinger-band breach flags over the trailing `window` rows, decided
    * in pure integer arithmetic (no sqrt): with S = Σc, Q = Σc², n rows,
    *   c > mean + k·std  ⟺  n·c − S > 0  ∧  (n·c − S)² > k²·(n·Q − S²).
    * Flags are null until the window is full (n < window). */
  def bollingerBreach(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String, window: Int = 20, k: Int = 2): DataFrame = {
    val w = wOrd(groupCol, orderCol)
      .rowsBetween(-(window - 1), W.currentRow)
    val c = col(centsCol)
    val n = count(lit(1)).over(w)
    val s = sum(c).over(w)
    val q = sum(c * c).over(w)
    val dev = n * c - s                 // n·(c − mean), exact
    val varN2 = n * q - s * s           // n²·var, exact
    val full = n === lit(window.toLong)
    df.withColumn("__dev", dev)
      .withColumn("__var", varN2)
      .withColumn("breach_up",
        when(full, col("__dev") > 0 &&
          col("__dev") * col("__dev") > lit(k.toLong * k) * col("__var")))
      .withColumn("breach_dn",
        when(full, col("__dev") < 0 &&
          col("__dev") * col("__dev") > lit(k.toLong * k) * col("__var")))
      .drop("__dev", "__var")
  }

  /** Realized variance + bipower variation per (group, bucket) — the
    * jump-detection pair from high-frequency econometrics
    * (Barndorff-Nielsen & Shephard 2004): RV = Σr² loads on BOTH
    * diffusion and jumps, BV = Σ|rᵢ||rᵢ₋₁| is jump-robust, so a low
    * BV/RV ratio flags jump days. Returns are consecutive in-bucket
    * deltas; all sums exact integers, the ratio is one rounded division.
    * Output: (groupCol, bucket, n_ret, rv, bv, bv_ratio_micro).
    */
  def realizedVol(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String, bucket: Column): DataFrame = {
    val wOrd = W.partitionBy(col(groupCol), bucket).orderBy(col(orderCol))
    val r = df
      .withColumn("__r", col(centsCol) - lag(col(centsCol), 1).over(wOrd))
      .withColumn("__rp", lag(abs(col("__r")), 1).over(wOrd))
    r.filter(col("__r").isNotNull)
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n_ret"),
        sum(col("__r") * col("__r")).as("rv"),
        sum(when(col("__rp").isNotNull, abs(col("__r")) * col("__rp"))
          .otherwise(0L)).as("bv"))
      .withColumn("bv_ratio_micro",
        when(col("rv") > 0,
          round(col("bv").cast("double") / col("rv") * 1e6).cast("long")))
  }

  /** Cutler's RSI over the trailing `window` price deltas: 100·G/(G+L)
    * with G/L the trailing sums of up/down moves in cents. Null until
    * `window` deltas exist; 100.0 when L = 0 (all gains); one division. */
  def rsi(df: DataFrame, groupCol: String, orderCol: String,
      centsCol: String, window: Int = 14): DataFrame = {
    val w = wOrd(groupCol, orderCol)
    val wTrail = wOrd(groupCol, orderCol).rowsBetween(-(window - 1), W.currentRow)
    val delta = col(centsCol) - lag(col(centsCol), 1).over(w)
    val out = df
      .withColumn("__delta", delta)
      .withColumn("gain_cents",
        sum(when(col("__delta") > 0, col("__delta")).otherwise(lit(0L))).over(wTrail))
      .withColumn("loss_cents",
        sum(when(col("__delta") < 0, -col("__delta")).otherwise(lit(0L))).over(wTrail))
      .withColumn("__n_delta",
        count(col("__delta")).over(wTrail))
    out.withColumn("rsi",
        when(col("__n_delta") === lit(window.toLong) &&
            col("gain_cents") + col("loss_cents") > 0,
          round(lit(100.0) * col("gain_cents") /
            (col("gain_cents") + col("loss_cents")), 9)))
      .drop("__delta", "__n_delta")
  }
}
