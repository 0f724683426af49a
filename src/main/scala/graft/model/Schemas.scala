package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the lake's 9 table families (SURVEY.md §1.2).
  *
  * Policy: dates are `DateType` internally (the reference stores ISO strings
  * and filters lexicographically — reference storage/clients/ticks.py:199-201;
  * we normalize to DateType at the boundary). Minute timestamps are
  * `TimestampNTZType` ET wall-clock (reference storage/pipeline/collectors.py:330-364).
  * Money is Double with fixed decimal precision at rest, never Decimal
  * (reference collectors.py:53-60 rounds OHLCV to 4dp).
  */
object Schemas {

  val dailyTicks: StructType = StructType(Seq(
    StructField("security_id", LongType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType)))

  val minuteTicks: StructType = StructType(Seq(
    StructField("security_id", LongType, nullable = false),
    StructField("ts", TimestampNTZType, nullable = false), // ET wall clock
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("num_trades", LongType),
    StructField("vwap", DoubleType)))

  /** EAV long fundamentals (reference collectors.py:488-530, dtypes :609-619). */
  val fundamentalLong: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("as_of_date", DateType, nullable = false), // filing date
    StructField("accn", StringType),
    StructField("form", StringType),
    StructField("concept", StringType, nullable = false),
    StructField("value", DoubleType),
    StructField("start", DateType),
    StructField("end", DateType),
    StructField("frame", StringType),
    StructField("is_instant", BooleanType)))

  /** TTM long = fundamentalLong minus is_instant (reference derived/ttm.py:24-26). */
  val ttmLong: StructType = StructType(fundamentalLong.fields.filterNot(_.name == "is_instant"))

  val derivedMetricsLong: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("as_of_date", DateType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("value", DoubleType)))

  /** SCD-2 master (reference master/security_master.py:524-537,626-638).
    * permno is declared wide (long): the reference's CRSP permnos fit an
    * int32, but the derived synthetic master keys off c_custkey, and
    * KEY-domain columns must survive the scale harness's id offsets
    * (blowup keys exceed 2^31 — the q166 CAST_OVERFLOW lesson, re-learned
    * by q185's x100 leg in round 10).
    */
  val securityMaster: StructType = StructType(Seq(
    StructField("security_id", LongType, nullable = false),
    StructField("permno", LongType),
    StructField("symbol", StringType, nullable = false),
    StructField("company", StringType),
    StructField("cik", StringType), // 10-digit zero-padded
    StructField("cusip", StringType),
    StructField("start_date", DateType, nullable = false),
    StructField("end_date", DateType, nullable = false)))

  val tradingCalendar: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false)))

  /** The 16 duration (flow) concepts; the rest of the 31 are instant (stock).
    * Reference collection/fundamental.py:27-44.
    */
  val durationConcepts: Set[String] = Set(
    "rev", "cor", "op_inc", "net_inc", "ibt", "inc_tax_exp", "int_exp",
    "rnd", "sga", "dna", "cfo", "cfi", "cff", "capex", "div", "sto_isu")
}
