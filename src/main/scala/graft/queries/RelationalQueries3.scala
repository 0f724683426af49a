package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third relational batch: the W7 Q4-derivation shape and A12 approximate
  * distinct.
  */
object RelationalQueries3 {

  type Q = (SparkSession, String) => DataFrame

  /** W7 — annual-minus-quarters derivation (the reference's Q4 = FY − Q1 −
    * Q2 − Q3, collection/fundamental.py:209-276) expressed over orders:
    * per (custkey, year), derive Q4 spend from the FY total and the three
    * standalone quarter totals, alongside the directly-aggregated Q4 —
    * the oracle checks both, proving the derivation identity on exact
    * integer cents.
    */
  def q46Q4Derivation(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .withColumn("qtr", quarter(col("o_orderdate")))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    o.groupBy(col("o_custkey"), col("yr"))
      .agg(
        sum(col("cents")).as("fy"),
        sum(when(col("qtr") === 1, col("cents")).otherwise(0L)).as("q1"),
        sum(when(col("qtr") === 2, col("cents")).otherwise(0L)).as("q2"),
        sum(when(col("qtr") === 3, col("cents")).otherwise(0L)).as("q3"),
        sum(when(col("qtr") === 4, col("cents")).otherwise(0L)).as("q4_direct"))
      .select(col("o_custkey"), col("yr").cast("long").as("yr"),
        ((col("fy") - col("q1") - col("q2") - col("q3")) / 100.0).as("q4_derived"),
        (col("q4_direct") / 100.0).as("q4_direct"))
  }

  val q46Sql: String =
    """WITH a AS (
      |  SELECT o_custkey, year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_custkey, yr,
      |  (sum(cents) - sum(CASE WHEN qtr=1 THEN cents ELSE 0 END)
      |             - sum(CASE WHEN qtr=2 THEN cents ELSE 0 END)
      |             - sum(CASE WHEN qtr=3 THEN cents ELSE 0 END)) / 100.0 AS q4_derived,
      |  sum(CASE WHEN qtr=4 THEN cents ELSE 0 END) / 100.0 AS q4_direct
      |FROM a GROUP BY o_custkey, yr""".stripMargin

  /** A12 — approximate distinct (HLL++) next to the exact count. Sketch
    * estimates are engine-specific, so the oracle-checkable surface is the
    * exact count plus the RELATIVE-ERROR CONTRACT (|approx − exact| ≤ 5%
    * exact) — each engine asserts its own sketch, both must land inside the
    * published error bound for the hash to match.
    */
  def q47ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        count_distinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")) <=
          col("exact_parts") * 0.05).cast("int").as("approx_ok"))

  val q47Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |  CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
      |       <= count(DISTINCT l_partkey) * 0.05 AS INT) AS approx_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Minute→daily OHLC rollup shape (ticks.MinuteBars.toDailyBars): per
    * (user, day) the FIRST and LAST value by exact ns time plus sums —
    * min_by/max_by ordered aggregation.
    */
  def q48OhlcRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        min_by(col("value"), col("ts_ns")).as("open_v"),
        max_by(col("value"), col("ts_ns")).as("close_v"),
        max(col("value")).as("high_v"),
        min(col("value")).as("low_v"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_v"),
        count(lit(1)).as("n"))

  val q48Sql: String =
    """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |  min_by(value, ts) AS open_v,
      |  max_by(value, ts) AS close_v,
      |  max(value) AS high_v,
      |  min(value) AS low_v,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_v,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Minute→daily bars through `ticks.MinuteBars.toDailyBars` (events recast
    * as minute bars: value plays all four prices, event count plays trades).
    */
  def q49MinuteToDaily(s: SparkSession, dir: String): DataFrame = {
    val minute = Tables.events(s, dir).select(
      col("user_id").as("security_id"),
      col("ts"),
      col("value").as("open"), col("value").as("high"),
      col("value").as("low"), col("value").as("close"),
      col("event_id").as("volume"),
      lit(1L).as("num_trades"))
    graft.ticks.MinuteBars.toDailyBars(minute)
      .select(col("security_id"), date_format(col("date"), "yyyy-MM-dd").as("date"),
        col("open"), col("close"), col("high"), col("low"), col("num_trades"))
  }

  val q49Sql: String =
    """SELECT user_id AS security_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
      |  min_by(value, ts) AS open,
      |  max_by(value, ts) AS close,
      |  max(value) AS high,
      |  min(value) AS low,
      |  CAST(count(*) AS BIGINT) AS num_trades
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Daily VWAP ([[graft.ticks.MinuteBars.vwapDaily]]): events recast as
    * minute bars (value = price, a key-derived small integer = volume so
    * weights genuinely vary). Integer-cents numerator ⇒ the single final
    * division is bit-reproducible; zero-volume groups surface as null.
    */
  def q133Vwap(s: SparkSession, dir: String): DataFrame = {
    val minute = Tables.events(s, dir).select(
      col("user_id").as("security_id"),
      col("ts"),
      col("value").as("close"),
      // %11 INCLUDING zero-volume bars — the null-guard path stays live
      (col("event_id") % 11).as("volume"))
    graft.ticks.MinuteBars.vwapDaily(minute)
      .select(col("security_id"),
        date_format(col("date"), "yyyy-MM-dd").as("date"),
        round(col("vwap"), 9).as("vwap_r"), col("volume"))
  }

  val q133Sql: String =
    """SELECT user_id AS security_id,
      |  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
      |  round(CASE WHEN sum(event_id % 11) > 0
      |    THEN CAST(sum(CAST(round(value*100) AS BIGINT) * (event_id % 11)) AS DOUBLE)
      |         / CAST(sum(event_id % 11) AS DOUBLE) / 100.0 END, 9) AS vwap_r,
      |  CAST(sum(event_id % 11) AS BIGINT) AS volume
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Benford first-digit audit ([[graft.operators.DataQuality.benford]])
    * over order-total cents: fixed micro-integer expected probabilities
    * (no runtime log10), exact string-math digit extraction, per-digit
    * deviation with a single rounded division — no float aggregate
    * whose summation order could drift between engines.
    */
  def q178Benford(s: SparkSession, dir: String): DataFrame =
    graft.operators.DataQuality.benford(
      Tables.orders(s, dir), round(col("o_totalprice") * 100))

  val q178Sql: String = {
    val values = graft.operators.DataQuality.BenfordMicro.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
    s"""WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders WHERE round(o_totalprice * 100) > 0),
      |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS obs FROM v GROUP BY 1),
      |p AS (SELECT * FROM (VALUES $values) t(digit, p_micro)),
      |n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM d)
      |SELECT CAST(p.digit AS INT) AS digit,
      |  CAST(coalesce(d.obs, 0) AS BIGINT) AS obs, n.n,
      |  CAST(n.n * p.p_micro AS BIGINT) AS exp_micro,
      |  CAST(round(
      |    CAST(coalesce(d.obs, 0) * 1000000 - n.n * p.p_micro AS DOUBLE)
      |    * CAST(coalesce(d.obs, 0) * 1000000 - n.n * p.p_micro AS DOUBLE)
      |    / (CAST(n.n * p.p_micro AS DOUBLE) * 1e6)) AS BIGINT) AS dev_micro
      |FROM p CROSS JOIN n LEFT JOIN d ON p.digit = d.digit""".stripMargin
  }

  /** HHI concentration ([[graft.operators.DataQuality.hhi]]): supplier
    * |balance|-share concentration per region (supplier⋈nation⋈region
    * dims broadcast), Σshare² from exact integer weight moments with one
    * double division.
    */
  def q179Hhi(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
    graft.operators.DataQuality.hhi(sup, Seq("r_name"),
      abs(round(col("s_acctbal") * 100)))
  }

  val q179Sql: String =
    """WITH w AS (SELECT r_name,
      |    abs(CAST(round(s_acctbal * 100) AS BIGINT)) AS w
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |m AS (SELECT r_name, count(*) AS n, CAST(sum(w) AS BIGINT) AS total,
      |    CAST(sum(w * w) AS BIGINT) AS sq FROM w GROUP BY 1)
      |SELECT r_name, n, total,
      |  CAST(round(CAST(sq AS DOUBLE)
      |    / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) * 1e6) AS BIGINT)
      |    AS hhi_micro
      |FROM m WHERE total > 0""".stripMargin

  val queries: Map[String, Q] = Map(
    "q178_benford" -> (q178Benford _),
    "q179_hhi" -> (q179Hhi _),
    "q46_q4_derivation" -> (q46Q4Derivation _),
    "q47_approx_distinct" -> (q47ApproxDistinct _),
    "q48_ohlc_rollup" -> (q48OhlcRollup _),
    "q49_minute_to_daily" -> (q49MinuteToDaily _),
    "q133_vwap" -> (q133Vwap _))

  val oracleSql: Map[String, String] = Map(
    "q178_benford" -> q178Sql,
    "q179_hhi" -> q179Sql,
    "q46_q4_derivation" -> q46Sql,
    "q47_approx_distinct" -> q47Sql,
    "q48_ohlc_rollup" -> q48Sql,
    "q49_minute_to_daily" -> q49Sql,
    "q133_vwap" -> q133Sql)
}
