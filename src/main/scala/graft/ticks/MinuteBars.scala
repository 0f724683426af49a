package graft.ticks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minute-bar timestamp handling (SURVEY §1.2 #2, risk register §7.5 #6):
  * the reference stores minute bars as tz-naive ET wall-clock
  * (UTC source → America/New_York → tz stripped, reference
  * storage/pipeline/collectors.py:330-364). Spark mapping:
  * `TimestampNTZType` at rest, conversion through `from_utc_timestamp` /
  * `to_utc_timestamp` at the boundary — DST transitions fold/gap exactly as
  * the exchange clock does.
  */
object MinuteBars {

  val EasternTz = "America/New_York"

  /** UTC instant → ET wall-clock (tz-naive at rest). */
  def utcToEtWallClock(utcTs: Column): Column =
    from_utc_timestamp(utcTs, EasternTz).cast("timestamp_ntz")

  /** ET wall-clock → UTC instant (for re-export / joins with UTC feeds).
    * Ambiguous fall-back hours resolve to the earlier (DST) offset, matching
    * Java time-zone semantics the reference inherits from zoneinfo.
    */
  def etWallClockToUtc(etTs: Column): Column =
    to_utc_timestamp(etTs.cast("timestamp"), EasternTz)

  /** Nanosecond-suffixed source timestamps → microsecond truncation
    * (reference collectors.py:341-345 parses and truncates). Integral
    * division — `/` would round through double and drift by 1 µs on
    * modern epoch values.
    */
  def truncateNanos(tsNs: Column): Column =
    timestamp_micros(call_function("div", tsNs, lit(1000L)))

  /** Regular-session filter: 09:30 ≤ wall clock < 16:00 ET. */
  def regularSession(etTs: Column): Column = {
    val minuteOfDay = hour(etTs) * 60 + minute(etTs)
    minuteOfDay >= (9 * 60 + 30) && minuteOfDay < 16 * 60
  }

  /** Minute bars → daily OHLCV rollup (first/last by time, max/min, sums) —
    * the aggregation the reference performs per-security in memory, here a
    * single grouped pass keyed by (security_id, ET date).
    */
  def toDailyBars(minute: DataFrame): DataFrame =
    minute
      .withColumn("date", to_date(col("ts")))
      .groupBy(col("security_id"), col("date"))
      .agg(
        min_by(col("open"), col("ts")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("ts")).as("close"),
        sum(col("volume")).as("volume"),
        sum(col("num_trades")).as("num_trades"))

  /** Daily VWAP per security: Σ(price_cents·volume) / Σvolume / 100 — the
    * canonical execution-quality benchmark. The weighted numerator folds
    * as an exact integer (price in cents × integer volume), so the one
    * IEEE division at the end is bit-reproducible across engines and
    * reduction orders; zero-volume days come back null rather than ±Inf.
    * Same single grouped pass as [[toDailyBars]] — partial-agg'd,
    * window-free, linear at any scale.
    */
  def vwapDaily(minute: DataFrame, priceCol: String = "close",
      volCol: String = "volume"): DataFrame = {
    val num = sum(round(col(priceCol) * 100).cast("long") * col(volCol))
    val vol = sum(col(volCol))
    minute
      .withColumn("date", to_date(col("ts")))
      .groupBy(col("security_id"), col("date"))
      .agg(
        when(vol > 0, num.cast("double") / vol.cast("double") / lit(100.0))
          .as("vwap"),
        vol.as("volume"))
  }
}
