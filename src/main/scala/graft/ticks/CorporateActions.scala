package graft.ticks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-adjusted price history — THE canonical equity-lake transform
  * (every raw price before a 2-for-1 split must be shown halved so the
  * series is continuous). The reference serves exactly this:
  * CRSP's cumulative price adjustment factor divides every price
  * (`collection/crsp_ticks.py:137-155`, `openprc / cfacpr`), and the
  * Alpaca path requests `adjustment: "split"`
  * (`collection/alpaca_ticks.py:116`). The reference CONSUMES a
  * precomputed cumulative factor; this operator also DERIVES it from a
  * raw corporate-actions feed. Adjustment factors are kept as EXACT RATIONALS:
  * for price day d, factor = Π_{actions a: a.day > d} den_a / num_a,
  * with numerator and denominator products carried as separate BIGINTs
  * (split ratios are tiny integers; a century of splits stays far inside
  * int64) and ONE rounded division at the end. No float compounding, no
  * exp/log products.
  *
  * Shape: actions are dimension-sized PER SECURITY (a handful per
  * listing lifetime), so they fold to one array row per security and
  * join to the price facts on the security key — the fact table is
  * scanned once; the per-row factor is a higher-order fold over the
  * (tiny) future-action array, fully codegen-friendly.
  */
object CorporateActions {

  /** @param prices  (groupCol, dayCol, centsCol) rows
    * @param actions (groupCol, dayCol, num, den) — num:den split ON that
    *                day; prices strictly BEFORE it scale by den/num
    * @return prices + (fnum, fden, adj_milli) where
    *         adj_milli = round(cents·fnum·1000 / fden)
    */
  def adjust(prices: DataFrame, actions: DataFrame, groupCol: String,
      dayCol: String, centsCol: String): DataFrame = {
    val folded = actions.groupBy(col(groupCol))
      .agg(collect_list(struct(col(dayCol).as("d"),
        col("num").cast("long").as("num"),
        col("den").cast("long").as("den"))).as("__acts"))
    val future: Column = filter(col("__acts"), a => a("d") > col(dayCol))
    val prod = aggregate(future,
      struct(lit(1L).as("n"), lit(1L).as("d")),
      (acc, a) => struct((acc("n") * a("den")).as("n"),
        (acc("d") * a("num")).as("d")))
    prices
      .join(folded, Seq(groupCol), "left")
      .withColumn("__f", when(col("__acts").isNull,
        struct(lit(1L).as("n"), lit(1L).as("d"))).otherwise(prod))
      .withColumn("fnum", col("__f.n"))
      .withColumn("fden", col("__f.d"))
      .withColumn("adj_milli",
        round(col(centsCol) * col("fnum") * 1000 / col("fden")).cast("long"))
      .drop("__acts", "__f")
  }
}
