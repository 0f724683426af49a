package graft.ticks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Lake
import graft.master.SecurityMaster

/** The symbol-level read path (§3.3 — reference storage/clients/ticks.py):
  * `getDailyTicks(symbol, range)` resolves the symbol to security_id(s) via
  * the temporal master (broadcast as-of join, with fuzzy fallback), then
  * reads the lake with partition pruning on security_id/year and a date
  * range filter.
  *
  * The reference's hand-rolled month routing and (symbol, year) caches
  * (ticks.py:130-171,271-292) dissolve into Catalyst partition pruning +
  * the broadcast dimension.
  */
class TicksClient(spark: SparkSession, root: String, master: DataFrame) {

  /** Bars for (symbol, [start, end]): resolved per-day via the master so a
    * rename boundary inside the range routes each day to the security that
    * carried the symbol then — plus fuzzy resolution for renamed symbols
    * (reference get_security_id auto_resolve semantics).
    */
  def getDailyTicks(symbol: String, start: String, end: String): DataFrame = {
    val s = lit(start).cast("date")
    val e = lit(end).cast("date")
    // Resolve the symbol against every master interval it overlaps with.
    val probe = spark.range(1).select(
      lit(symbol).as("symbol"),
      s.as("range_start"), e.as("range_end"))
    val m = master.select(
      col("symbol").as("m_symbol"), col("security_id"),
      col("start_date"), col("end_date"))
    val sids = probe.join(
        broadcast(m),
        col("symbol") === col("m_symbol") &&
          col("start_date") <= col("range_end") &&
          col("end_date") >= col("range_start"))
      .select(col("security_id"),
        greatest(col("start_date"), col("range_start")).as("eff_start"),
        least(col("end_date"), col("range_end")).as("eff_end"))

    val ticks = Lake.read(spark, root, "daily_ticks")
    ticks.join(broadcast(sids), Seq("security_id"))
      .filter(col("date").between(col("eff_start"), col("eff_end")))
      .drop("eff_start", "eff_end")
      .withColumn("symbol", lit(symbol))
      .orderBy(col("date"))
  }

  /** Split-adjusted daily read — reference parity for
    * `get_daily(..., adjusted=True)` (crsp_ticks.py:139-155, where
    * CRSP's cumulative factor divides each price; alpaca_ticks.py:116's
    * `adjustment: "split"`). Here the cumulative factor is DERIVED from
    * a raw actions feed `(security_id, date, num, den)` as exact
    * rationals via [[CorporateActions.adjust]]. Adds
    * (close_cents, fnum, fden, adj_milli, adj_close).
    */
  def getDailyTicksAdjusted(symbol: String, start: String, end: String,
      actions: DataFrame): DataFrame = {
    val raw = getDailyTicks(symbol, start, end)
      .withColumn("close_cents", round(col("close") * 100).cast("long"))
    CorporateActions
      .adjust(raw, actions, "security_id", "date", "close_cents")
      .withColumn("adj_close", col("adj_milli") / 100000.0)
  }

  /** Full-history read (reference get_daily_ticks_history,
    * ticks.py:81-130): all years with optional date bounds. The reference
    * resolves the symbol once, by the end year; routing each day through
    * its own master interval (getDailyTicks) is strictly more correct
    * across renames, and the consolidated-history-file special case
    * dissolves into the same pruned lake scan.
    */
  def getDailyTicksHistory(symbol: String,
      start: Option[String] = None, end: Option[String] = None): DataFrame =
    getDailyTicks(symbol,
      start.getOrElse("1900-01-01"), end.getOrElse("9999-12-31"))

  /** Year read with explicit partition-prunable predicates (S9 point read):
    * security_id and year reach the scan as PartitionFilters.
    */
  def getYear(securityId: Long, year: Int): DataFrame =
    Lake.read(spark, root, "daily_ticks")
      .filter(col("security_id") === securityId && col("year") === year)
      .orderBy(col("date"))

  /** Bulk (symbol, day) resolution for fact-table attachment. */
  def resolveSymbols(df: DataFrame): DataFrame =
    SecurityMaster.resolve(df, master)

  /** Minute bars for (symbol, trading day) — the reference's second read
    * API (minute layout `data/raw/ticks/minute/{security_id}/{YYYY}/{MM}/
    * {DD}/ticks.parquet`, reference storage/handlers/ticks.py:441,
    * update/app.py:619; symbol resolution _resolve_symbol,
    * storage/clients/ticks.py:130-146). The symbol resolves AS OF the
    * requested day (strictly more correct than the reference's year-end
    * resolution across an intra-year rename), and the read reaches the
    * scan as static PartitionFilters on all four partition columns —
    * the {sid}/{Y}/{MM}/{DD} directory walk with no IO outside the day.
    *
    * The sid lookup is a dimension-sized driver collect — the exact
    * lookup the reference caches driver-side per (symbol, year); the
    * master is broadcast-scale by construction.
    *
    * Bars come back in stored ET wall-clock (`timestamp_ntz`, see
    * [[MinuteBars]]): a spring-forward day has no 02:xx rows and a
    * fall-back day carries the 01:xx ET fold twice (two UTC instants,
    * one wall-clock minute) — exactly the exchange-clock shape.
    */
  def getMinuteTicks(symbol: String, day: String): DataFrame = {
    val d = java.time.LocalDate.parse(day)
    val sids = master
      .filter(col("symbol") === symbol &&
        col("start_date") <= lit(day).cast("date") &&
        col("end_date") >= lit(day).cast("date"))
      .select(col("security_id").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    Lake.read(spark, root, TicksClient.MinuteTable)
      .filter(col("security_id").isin(sids: _*) &&
        col("year") === d.getYear && col("month") === d.getMonthValue &&
        col("day") === d.getDayOfMonth)
      .withColumn("symbol", lit(symbol))
      .orderBy(col("ts"))
  }
}

object TicksClient {

  val MinuteTable = "minute_ticks"

  /** Write minute bars into the {sid}/{Y}/{MM}/{DD} layout. Partition
    * columns derive from the stored ET wall-clock `ts` — the reference's
    * day folders are ET trading days (handlers/ticks.py:441). Append-mode:
    * the daily incremental adds new day directories without touching old
    * ones (use [[graft.lake.Lake.overwritePartitions]] semantics via
    * [[rewriteMinuteTicks]] for idempotent re-runs).
    */
  def writeMinuteTicks(df: DataFrame, root: String): Unit =
    Lake.appendPartitions(withDayPartitions(df), root, MinuteTable,
      Seq("security_id", "year", "month", "day"))

  /** Idempotent variant: dynamic partition overwrite of exactly the
    * (sid, day) partitions present in `df`.
    */
  def rewriteMinuteTicks(df: DataFrame, root: String): Unit =
    Lake.overwritePartitions(withDayPartitions(df), root, MinuteTable,
      Seq("security_id", "year", "month", "day"))

  private def withDayPartitions(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
}
