package graft.universe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Universe construction: common-stock filtering and the monthly top-K
  * liquidity ranking (reference universe/current.py:20-88,147-160 and
  * universe/manager.py:181-245).
  */
object Universe {

  /** P5 — heuristic common-stock predicate over the security *name*:
    * excludes ETFs/funds/trusts/preferreds/warrants/units etc. via substring
    * blacklist + word-boundary regexes (reference universe/current.py:20-88).
    * Pure Column expression — codegen'd, no UDF.
    */
  def isCommonStock(name: Column): Column = {
    val n = upper(name)
    val substrBlacklist = Seq(
      "ETF", "ETN", "FUND", "TRUST", "REIT", "DEPOSITARY", "DEPOSITORY",
      "PREFERRED", "PFD", "WARRANT", "RIGHTS", "UNIT ", " NOTES", "BOND",
      "%")
    val hasBlacklisted = substrBlacklist
      .map(s => n.contains(s))
      .reduce(_ || _)
    // Word-boundary patterns that substring match would over-fire on.
    val wordPattern = "(^|\\s)(LP|L\\.P\\.|SPAC|SBI|ADR)(\\s|$)"
    !(hasBlacklisted || n.rlike(wordPattern))
  }

  /** Symbols active at any point during `year`, from the temporal master
    * (reference universe/manager.py:87-178 load_symbols_for_year): master
    * validity intervals overlapping the year, symbol format converted per
    * consumer — SEC uses '-' class separators, Alpaca '.' (BRK-B ↔ BRK.B).
    * The reference's per-year WRDS query + cache dissolve into a broadcast
    * filter over the master dimension.
    */
  def symbolsForYear(master: DataFrame, year: Int,
      symType: String = "alpaca"): DataFrame = {
    require(symType == "alpaca" || symType == "sec",
      s"symType must be alpaca|sec, got $symType")
    val y0 = lit(f"$year%04d-01-01").cast("date")
    val y1 = lit(f"$year%04d-12-31").cast("date")
    val sym =
      if (symType == "sec") regexp_replace(col("symbol"), "\\.", "-")
      else regexp_replace(col("symbol"), "-", ".")
    master
      .filter(col("start_date") <= y1 && col("end_date") >= y0)
      .select(sym.as("symbol"))
      .distinct()
  }

  /** A4 + O1 — top-K by average daily dollar volume (reference
    * universe/manager.py:216-235): adv = mean(close*volume) per symbol,
    * filter adv > minAdv, take K best. Deterministic tiebreak on symbol.
    * Physical plan: partial-agg + TakeOrderedAndProject (no global sort).
    */
  def topByDollarVolume(bars: DataFrame, k: Int = 3000,
      minAdv: Double = 1000.0, symbolCol: String = "symbol"): DataFrame =
    bars
      .groupBy(col(symbolCol))
      .agg(avg(col("close") * col("volume")).as("adv"))
      .filter(col("adv") > minAdv)
      .orderBy(col("adv").desc, col(symbolCol).asc)
      .limit(k)
}
