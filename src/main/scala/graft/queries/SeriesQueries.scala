package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series monitoring wave: CUSUM change-point detection over the
  * per-type daily event volume series. The closed-form prefix-sum
  * formulation makes the whole detector two ordered-window aggregates
  * over exact integers — replayed verbatim by the DuckDB oracle.
  */
object SeriesQueries {

  type Q = (SparkSession, String) => DataFrame

  /** CUSUM drift monitor ([[graft.operators.ChangePoint.cusum]]) on daily
    * event counts per type: reference level k = the series mean, alarm
    * at 3·√(k/1000)·1000 (Poisson σ of a count series). Exact milli
    * integers end to end; the prefix-sum/running-extreme closed form and
    * both alarm flags are all under the hash.
    */
  def q153Cusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        (col("cnt") * 1000).as("v_milli"))
    graft.operators.ChangePoint.cusum(
      daily, Seq("event_type"), "day", "v_milli", sigmaMult = 3.0)
  }

  val q153Sql: String =
    """WITH daily AS (SELECT event_type,
      |    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |    CAST(count(*) * 1000 AS BIGINT) AS v_milli
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, day, v_milli,
      |    CAST(round(avg(v_milli) OVER (PARTITION BY event_type)) AS BIGINT)
      |      AS k_milli
      |  FROM daily),
      |p AS (SELECT *, sum(v_milli - k_milli) OVER
      |    (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING)
      |    AS pp FROM w),
      |m AS (SELECT *,
      |    least(0, min(pp) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING)) AS pmin,
      |    greatest(0, max(pp) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING)) AS pmax
      |  FROM p),
      |h AS (SELECT *,
      |    CAST(round(3.0 * sqrt(k_milli / 1000.0) * 1000) AS BIGINT) AS hh
      |  FROM m)
      |SELECT event_type, day, v_milli, k_milli,
      |  CAST(pp - pmin AS BIGINT) AS s_pos_milli,
      |  CAST(pmax - pp AS BIGINT) AS s_neg_milli,
      |  (pp - pmin) > hh AS flag_pos,
      |  (pmax - pp) > hh AS flag_neg
      |FROM h""".stripMargin

  /** Trailing-window aggregate join ([[graft.operators.RangeAgg
    * .trailingSum]]): per purchase, the sum/count of view value-cents in
    * the trailing 3 days for the same user — computed as S(t) − S(t−w)
    * via two prefix-sum as-of probes (O(|L|+|R|), no range-join
    * explosion). The oracle replays it as the literal range join + group
    * — two different algorithms, one hash.
    */
  def q157TrailingAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ns").as("v_ts"),
        round(col("value") * 100).cast("long").as("cents"))
    graft.operators.RangeAgg.trailingSum(purchases, views,
        keys = Seq("user_id"), leftOn = "ts_ns", rightOn = "v_ts",
        valueCol = "cents", windowSize = lit(3L * 86400L * 1000000000L))
      .select(col("event_id"), col("user_id"), col("trail_sum"), col("trail_cnt"))
  }

  val q157Sql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id,
      |  CAST(coalesce(sum(v.cents), 0) AS BIGINT) AS trail_sum,
      |  count(v.cents) AS trail_cnt
      |FROM p LEFT JOIN v ON p.user_id = v.user_id
      |  AND v.ts > p.ts - INTERVAL 3 DAY AND v.ts <= p.ts
      |GROUP BY 1, 2""".stripMargin

  /** Events recast as a per-user price series (value→cents, ordered by
    * ts — fixture has no (user_id, ts) ties, so the order is total). */
  private def priceSeries(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("ts"),
      round(col("value") * 100).cast("long").as("cents"))

  /** Max-drawdown summary ([[graft.ticks.Indicators.drawdownSummary]]):
    * running peak → drawdown → running max, all integer cents; the
    * per-security worst drawdown plus peak/new-peak-count diagnostics.
    */
  def q159Drawdown(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Indicators.drawdownSummary(
      priceSeries(s, dir), "user_id", "ts", "cents")
      .select(col("user_id"), col("max_dd_cents"), col("peak_cents"),
        col("n_new_peaks"), col("n_obs"))

  val q159Sql: String =
    """WITH px AS (SELECT user_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |r AS (SELECT user_id, cents, max(cents) OVER (PARTITION BY user_id
      |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS peak FROM px)
      |SELECT user_id,
      |  CAST(max(peak - cents) AS BIGINT) AS max_dd_cents,
      |  CAST(max(peak) AS BIGINT) AS peak_cents,
      |  CAST(sum(CASE WHEN cents = peak THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new_peaks,
      |  count(*) AS n_obs
      |FROM r GROUP BY 1""".stripMargin

  /** Dyadic EWMA ([[graft.ticks.Indicators.ewmaDyadic]], W=8): exact
    * BIGINT numerator/denominator with weights 2^(7−j), one IEEE
    * division under the hash. Head rows renormalise over present lags.
    */
  def q160Ewma(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Indicators.ewmaDyadic(
      priceSeries(s, dir), "user_id", "ts", "cents", window = 8)
      .select(col("user_id"), col("event_id"),
        col("ewma_num"), col("ewma_den"), col("ewma"))

  val q160Sql: String =
    """WITH px AS (SELECT user_id, event_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |l AS (SELECT user_id, event_id,
      |    cents AS c0, lag(cents, 1) OVER w AS c1,
      |    lag(cents, 2) OVER w AS c2, lag(cents, 3) OVER w AS c3,
      |    lag(cents, 4) OVER w AS c4, lag(cents, 5) OVER w AS c5,
      |    lag(cents, 6) OVER w AS c6, lag(cents, 7) OVER w AS c7
      |  FROM px WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |nd AS (SELECT user_id, event_id,
      |    CAST(coalesce(c0*128,0) + coalesce(c1*64,0) + coalesce(c2*32,0)
      |      + coalesce(c3*16,0) + coalesce(c4*8,0) + coalesce(c5*4,0)
      |      + coalesce(c6*2,0) + coalesce(c7*1,0) AS BIGINT) AS ewma_num,
      |    CAST((CASE WHEN c0 IS NULL THEN 0 ELSE 128 END)
      |      + (CASE WHEN c1 IS NULL THEN 0 ELSE 64 END)
      |      + (CASE WHEN c2 IS NULL THEN 0 ELSE 32 END)
      |      + (CASE WHEN c3 IS NULL THEN 0 ELSE 16 END)
      |      + (CASE WHEN c4 IS NULL THEN 0 ELSE 8 END)
      |      + (CASE WHEN c5 IS NULL THEN 0 ELSE 4 END)
      |      + (CASE WHEN c6 IS NULL THEN 0 ELSE 2 END)
      |      + (CASE WHEN c7 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS ewma_den
      |  FROM l)
      |SELECT user_id, event_id, ewma_num, ewma_den,
      |  round(CAST(ewma_num AS DOUBLE) / ewma_den / 100.0, 9) AS ewma
      |FROM nd""".stripMargin

  /** Bollinger breach ([[graft.ticks.Indicators.bollingerBreach]], n=20,
    * k=1): the band test decided in PURE integer arithmetic — no sqrt,
    * no float, flags cannot drift. Full windows only (flags non-null).
    * k=1 (not the charting default 2) because the fixture's value
    * distribution is right-skewed: at k=2 the down side never fires
    * (0 rows — a vacuous gate); at k=1 both flags are live (~1105/~554).
    */
  def q161Bollinger(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Indicators.bollingerBreach(
      priceSeries(s, dir), "user_id", "ts", "cents", window = 20, k = 1)
      .filter(col("breach_up").isNotNull) // flags are null ⟺ window not full
      .select(col("user_id"), col("event_id"), col("cents"),
        col("breach_up"), col("breach_dn"))

  val q161Sql: String =
    """WITH px AS (SELECT user_id, event_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |w AS (SELECT user_id, event_id, cents,
      |    count(*) OVER tw AS n, sum(cents) OVER tw AS s,
      |    sum(cents * cents) OVER tw AS q
      |  FROM px WINDOW tw AS (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, cents,
      |  (n*cents - s) > 0 AND (n*cents-s)*(n*cents-s) > 1*(n*q - s*s)
      |    AS breach_up,
      |  (n*cents - s) < 0 AND (n*cents-s)*(n*cents-s) > 1*(n*q - s*s)
      |    AS breach_dn
      |FROM w WHERE n = 20""".stripMargin

  /** Cutler RSI ([[graft.ticks.Indicators.rsi]], n=14): trailing
    * gain/loss cents sums (exact), 100·G/(G+L) as the one division.
    * Early rows (< 14 deltas) carry null rsi; G=L=0 guards to null.
    */
  def q162Rsi(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Indicators.rsi(
      priceSeries(s, dir), "user_id", "ts", "cents", window = 14)
      .select(col("user_id"), col("event_id"),
        col("gain_cents"), col("loss_cents"), col("rsi"))

  val q162Sql: String =
    """WITH px AS (SELECT user_id, event_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |d AS (SELECT user_id, event_id, ts,
      |    cents - lag(cents, 1) OVER (PARTITION BY user_id ORDER BY ts)
      |      AS delta FROM px),
      |g AS (SELECT user_id, event_id,
      |    CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER tw
      |      AS BIGINT) AS gain_cents,
      |    CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER tw
      |      AS BIGINT) AS loss_cents,
      |    count(delta) OVER tw AS nd
      |  FROM d WINDOW tw AS (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, gain_cents, loss_cents,
      |  CASE WHEN nd = 14 AND gain_cents + loss_cents > 0
      |    THEN round(100.0 * gain_cents / (gain_cents + loss_cents), 9)
      |  END AS rsi
      |FROM g""".stripMargin

  /** Daily close series: last value per (user, day) — max_by is exact
    * (no (user, ts) ties in the fixture). */
  private def dailyClose(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(round(max_by(col("value"), col("ts")) * 100).cast("long").as("cents"))

  private val dailyCloseSql: String =
    """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |    CAST(round(max_by(value, ts) * 100) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** Historical VaR/ES ([[graft.ticks.Risk.historicalVar]], α = 5%):
    * exact order statistics of the per-security daily P&L distribution —
    * the ⌈α·n⌉ index computed with integer `div` (float ceil is off by
    * one at n = 20k), the ES tail kept as an exact sum/count pair.
    */
  def q169HistoricalVar(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Risk.historicalVar(
      dailyClose(s, dir), "user_id", "day", "cents",
      alphaNum = 5, alphaDen = 100)

  val q169Sql: String =
    s"""WITH px AS ($dailyCloseSql),
      |d AS (SELECT user_id, day,
      |    cents - lag(cents) OVER (PARTITION BY user_id ORDER BY day) AS dd
      |  FROM px),
      |dd AS (SELECT * FROM d WHERE dd IS NOT NULL),
      |r AS (SELECT user_id, day, dd,
      |    row_number() OVER (PARTITION BY user_id ORDER BY dd, day) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM dd),
      |k AS (SELECT *, (n * 5 + 99) // 100 AS kk FROM r)
      |SELECT user_id, max(n) AS n_deltas,
      |  CAST(max(CASE WHEN rn = kk THEN dd END) AS BIGINT) AS var_cents,
      |  CAST(sum(CASE WHEN rn <= kk THEN dd END) AS BIGINT) AS es_sum_cents,
      |  CAST(sum(CASE WHEN rn <= kk THEN 1 ELSE 0 END) AS BIGINT) AS es_n
      |FROM k GROUP BY 1""".stripMargin

  /** Cross-sectional momentum backtest ([[graft.ticks.Backtest
    * .momentumTopK]], lookback 5, top 10): per-security trailing delta,
    * per-DAY rank (day-partitioned window — never global), next-period
    * P&L attribution. Integer cents end to end.
    */
  def q170Momentum(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Backtest.momentumTopK(
      dailyClose(s, dir), "user_id", "day", "cents", lookback = 5, k = 10)

  val q170Sql: String =
    s"""WITH px AS ($dailyCloseSql),
      |e AS (SELECT user_id, day, cents,
      |    cents - lag(cents, 5) OVER w AS mom,
      |    lead(cents, 1) OVER w - cents AS fwd
      |  FROM px WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |f AS (SELECT * FROM e WHERE mom IS NOT NULL AND fwd IS NOT NULL),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY day ORDER BY mom DESC, user_id) AS rk FROM f)
      |SELECT day, count(*) AS n_selected,
      |  CAST(sum(fwd) AS BIGINT) AS pnl_cents,
      |  CAST(max(fwd) AS BIGINT) AS best_cents,
      |  CAST(min(fwd) AS BIGINT) AS worst_cents
      |FROM r WHERE rk <= 10 GROUP BY 1""".stripMargin

  /** Split-adjusted history ([[graft.ticks.CorporateActions.adjust]]):
    * factors as EXACT rationals (den/num products as separate BIGINTs,
    * one rounded division at the end — no float compounding). Actions
    * planted from the fixture: every %5 user a 2:1 split at its 10th
    * day, every %10 user also a 3:2 at its 20th — so single-action,
    * stacked-action, and no-action paths are ALL live, as are the
    * before/on/after-split factor regimes.
    */
  def q174SplitAdjust(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val px = dailyClose(s, dir)
    val rk = px.withColumn("rn",
      row_number().over(W.partitionBy(col("user_id")).orderBy(col("day"))))
    val acts = rk
      .filter(col("user_id") % 5 === 0 && col("rn") === 10)
      .select(col("user_id"), col("day"), lit(2L).as("num"), lit(1L).as("den"))
      .unionByName(rk
        .filter(col("user_id") % 10 === 0 && col("rn") === 20)
        .select(col("user_id"), col("day"), lit(3L).as("num"), lit(2L).as("den")))
    graft.ticks.CorporateActions.adjust(px, acts, "user_id", "day", "cents")
      .select(col("user_id"), col("day"), col("cents"),
        col("fnum"), col("fden"), col("adj_milli"))
  }

  val q174Sql: String =
    s"""WITH px AS ($dailyCloseSql),
      |rk AS (SELECT user_id, day, cents, row_number() OVER
      |    (PARTITION BY user_id ORDER BY day) AS rn FROM px),
      |acts AS (
      |  SELECT user_id, day, 2 AS num, 1 AS den FROM rk
      |  WHERE user_id % 5 = 0 AND rn = 10
      |  UNION ALL
      |  SELECT user_id, day, 3 AS num, 2 AS den FROM rk
      |  WHERE user_id % 10 = 0 AND rn = 20),
      |f AS (SELECT p.user_id, p.day, p.cents,
      |    CAST(coalesce(product(CASE WHEN a.day > p.day THEN a.den END), 1)
      |      AS BIGINT) AS fnum,
      |    CAST(coalesce(product(CASE WHEN a.day > p.day THEN a.num END), 1)
      |      AS BIGINT) AS fden
      |  FROM px p LEFT JOIN acts a ON p.user_id = a.user_id
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, day, cents, fnum, fden,
      |  CAST(round(CAST(cents * fnum * 1000 AS DOUBLE) / fden) AS BIGINT)
      |    AS adj_milli
      |FROM f""".stripMargin

  /** NBBO consolidation ([[graft.ticks.Nbbo.consolidate]]): four
    * synthetic venues (event_id % 4) quoting bid/ask cents; per quote
    * event, forward-fill each venue's latest quote along the symbol
    * timeline (total order: ts then event_id — user folding makes raw
    * ts non-unique per symbol) and take the cross-venue best, with the
    * locked/crossed tape-quality flag.
    */
  def q175Nbbo(s: SparkSession, dir: String): DataFrame = {
    // tight per-symbol quotes (jitter 0..4 ≪ spread 10..16) with rare +25
    // bid spikes (event_id % 97): locked/crossed runs start at a spike and
    // end when the spiking venue re-quotes — both flag values are live and
    // the false side dominates, as on a real tape
    val base = (col("user_id") % 20 + 1) * 1000 + col("event_id") % 5
    val bid = base + when(col("event_id") % 97 === 0, 25L).otherwise(0L)
    val q = Tables.events(s, dir).select(
      (col("user_id") % 20).as("sym"), col("ts"), col("event_id"),
      (col("event_id") % 4).cast("int").as("venue"),
      bid.cast("long").as("bid"),
      (bid + col("event_id") % 7 + 10).cast("long").as("ask"))
    graft.ticks.Nbbo.consolidate(q, "sym", Seq("ts", "event_id"),
        "venue", "bid", "ask", nVenues = 4)
      .select(col("sym"), col("event_id"),
        col("nbbo_bid"), col("nbbo_ask"), col("locked"))
  }

  val q175Sql: String = {
    val b = (0 to 3).map(v =>
      s"last_value(CASE WHEN venue = $v THEN bid END IGNORE NULLS) OVER w AS b$v")
    val a = (0 to 3).map(v =>
      s"last_value(CASE WHEN venue = $v THEN ask END IGNORE NULLS) OVER w AS a$v")
    s"""WITH q AS (SELECT user_id % 20 AS sym, ts, event_id,
      |    CAST(event_id % 4 AS INT) AS venue,
      |    CAST((user_id % 20 + 1) * 1000 + event_id % 5
      |      + (CASE WHEN event_id % 97 = 0 THEN 25 ELSE 0 END) AS BIGINT) AS bid,
      |    CAST((user_id % 20 + 1) * 1000 + event_id % 5
      |      + (CASE WHEN event_id % 97 = 0 THEN 25 ELSE 0 END)
      |      + event_id % 7 + 10 AS BIGINT) AS ask
      |  FROM events),
      |f AS (SELECT sym, event_id,
      |    ${(b ++ a).mkString(",\n      |    ")}
      |  FROM q WINDOW w AS (PARTITION BY sym ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING))
      |SELECT sym, event_id,
      |  greatest(b0, b1, b2, b3) AS nbbo_bid,
      |  least(a0, a1, a2, a3) AS nbbo_ask,
      |  greatest(b0, b1, b2, b3) IS NOT NULL
      |    AND least(a0, a1, a2, a3) IS NOT NULL
      |    AND greatest(b0, b1, b2, b3) >= least(a0, a1, a2, a3) AS locked
      |FROM f""".stripMargin
  }

  /** Tick-rule order-flow imbalance ([[graft.ticks.Microstructure
    * .flowImbalance]]): up/down-tick signing with zero-tick carry, then
    * per (symbol, day) signed-volume rollups — all exact integers; the
    * pre-signing head rows surface in n_unsigned.
    */
  def q176FlowImbalance(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.events(s, dir).select(
      col("user_id").as("sym"), col("ts"),
      round(col("value") * 100).cast("long").as("px"),
      (col("event_id") % 13 + 1).as("sz"))
    graft.ticks.Microstructure.flowImbalance(t, "sym", Seq("ts"), "px", "sz",
        bucket = date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .withColumnRenamed("bucket", "day")
  }

  private val signSql: String =
    """t AS (SELECT user_id AS sym, ts,
      |    CAST(round(value * 100) AS BIGINT) AS px,
      |    event_id % 13 + 1 AS sz FROM events),
      |d AS (SELECT *, px - lag(px) OVER (PARTITION BY sym ORDER BY ts)
      |    AS delta FROM t),
      |sgn AS (SELECT *, last_value(CASE WHEN delta > 0 THEN 1
      |      WHEN delta < 0 THEN -1 END IGNORE NULLS)
      |    OVER (PARTITION BY sym ORDER BY ts ROWS UNBOUNDED PRECEDING)
      |    AS side FROM d)""".stripMargin

  val q176Sql: String =
    s"""WITH $signSql
      |SELECT sym, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |  CAST(sum(CASE WHEN side = 1 THEN sz ELSE 0 END) AS BIGINT) AS buy_vol,
      |  CAST(sum(CASE WHEN side = -1 THEN sz ELSE 0 END) AS BIGINT) AS sell_vol,
      |  CAST(sum(CASE WHEN side = 1 THEN sz WHEN side = -1 THEN -sz
      |    ELSE 0 END) AS BIGINT) AS imbalance,
      |  CAST(sum(CASE WHEN side IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unsigned
      |FROM sgn GROUP BY 1, 2""".stripMargin

  /** Kyle's λ ([[graft.ticks.Microstructure.kyleLambda]]): per-symbol
    * OLS of price change on signed size through the exact-moment Trend
    * operator — the market-impact coefficient, bit-identical doubles
    * from sub-2^53 integer moments.
    */
  def q177KyleLambda(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.events(s, dir).select(
      col("user_id").as("sym"), col("ts"),
      round(col("value") * 100).cast("long").as("px"),
      (col("event_id") % 13 + 1).as("sz"))
    graft.ticks.Microstructure.kyleLambda(t, "sym", Seq("ts"), "px", "sz")
      .select(col("sym"), col("n"),
        round(col("slope"), 9).as("lambda_r"),
        round(col("intercept"), 9).as("intercept_r"),
        round(col("corr"), 9).as("corr_r"))
  }

  val q177Sql: String =
    s"""WITH $signSql,
      |f AS (SELECT sym, side * sz AS x, delta AS y FROM sgn
      |  WHERE side IS NOT NULL AND delta IS NOT NULL),
      |m AS (SELECT sym, CAST(count(*) AS BIGINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      |  FROM f GROUP BY 1)
      |SELECT sym, n,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 9)
      |    AS lambda_r,
      |  round((CAST(sy AS DOUBLE) -
      |    (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
      |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 9) AS intercept_r,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) /
      |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
      |      * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 9) AS corr_r
      |FROM m WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0""".stripMargin

  /** Pairs-trading spread monitor — pure operator COMPOSITION: daily
    * closes of user pairs (2u, 2u+1) join on day, the spread (may be
    * negative) runs through the integer-exact [[graft.ticks.Indicators
    * .bollingerBreach]] band test (n=10, k=1) — entry/exit signals with
    * zero float drift. Only days BOTH legs traded enter the spread.
    */
  def q180PairSpread(s: SparkSession, dir: String): DataFrame = {
    val px = dailyClose(s, dir)
    val a = px.filter(col("user_id") % 2 === 0).select(
      (col("user_id") / 2).cast("long").as("pair"), col("day"),
      col("cents").as("a_cents"))
    val b = px.filter(col("user_id") % 2 === 1).select(
      (col("user_id") / 2).cast("long").as("pair"), col("day"),
      col("cents").as("b_cents"))
    val spread = a.join(b, Seq("pair", "day"))
      .withColumn("spread", col("a_cents") - col("b_cents"))
    graft.ticks.Indicators.bollingerBreach(
        spread, "pair", "day", "spread", window = 10, k = 1)
      .filter(col("breach_up").isNotNull)
      .select(col("pair"), col("day"), col("spread"),
        col("breach_up"), col("breach_dn"))
  }

  val q180Sql: String =
    s"""WITH px AS ($dailyCloseSql),
      |a AS (SELECT user_id // 2 AS pair, day, cents AS a_cents FROM px
      |  WHERE user_id % 2 = 0),
      |b AS (SELECT user_id // 2 AS pair, day, cents AS b_cents FROM px
      |  WHERE user_id % 2 = 1),
      |sp AS (SELECT a.pair, a.day, a_cents - b_cents AS s
      |  FROM a JOIN b ON a.pair = b.pair AND a.day = b.day),
      |w AS (SELECT pair, day, s,
      |    count(*) OVER tw AS n, sum(s) OVER tw AS su,
      |    sum(s * s) OVER tw AS q
      |  FROM sp WINDOW tw AS (PARTITION BY pair ORDER BY day
      |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      |SELECT pair, day, CAST(s AS BIGINT) AS spread,
      |  (n*s - su) > 0 AND (n*s - su)*(n*s - su) > 1*(n*q - su*su)
      |    AS breach_up,
      |  (n*s - su) < 0 AND (n*s - su)*(n*s - su) > 1*(n*q - su*su)
      |    AS breach_dn
      |FROM w WHERE n = 10""".stripMargin

  /** Weekday-seasonality study: daily P&L deltas pooled by day-of-week —
    * exact integer moments (n, Σ, Σ²) per weekday plus the one-division
    * rounded mean; the calendar-effect analysis a returns lake serves.
    */
  def q181WeekdayEffect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col("user_id")).orderBy(col("day"))
    val d = dailyClose(s, dir)
      .withColumn("delta", col("cents") - lag(col("cents"), 1).over(w))
      .filter(col("delta").isNotNull)
      .withColumn("dow", dayofweek(to_date(col("day"))).cast("int"))
    d.groupBy(col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("delta")).as("sum_cents"),
        sum(col("delta") * col("delta")).as("sumsq"))
      .withColumn("mean_r",
        round(col("sum_cents").cast("double") / col("n"), 9))
  }

  val q181Sql: String =
    s"""WITH px AS ($dailyCloseSql),
      |d AS (SELECT user_id, day,
      |    cents - lag(cents) OVER (PARTITION BY user_id ORDER BY day)
      |      AS delta FROM px),
      |f AS (SELECT CAST(dayofweek(CAST(day AS DATE)) + 1 AS INT) AS dow,
      |    delta FROM d WHERE delta IS NOT NULL)
      |SELECT dow, count(*) AS n,
      |  CAST(sum(delta) AS BIGINT) AS sum_cents,
      |  CAST(sum(delta * delta) AS BIGINT) AS sumsq,
      |  round(CAST(sum(delta) AS DOUBLE) / count(*), 9) AS mean_r
      |FROM f GROUP BY 1""".stripMargin

  /** Realized variance + bipower variation ([[graft.ticks.Indicators
    * .realizedVol]]): per (symbol, day) over intra-day tick deltas —
    * RV = Σr² (loads on jumps), BV = Σ|rᵢ||rᵢ₋₁| (jump-robust), the
    * BV/RV micro ratio flags jump days. Exact integer sums, one rounded
    * division.
    */
  def q182RealizedVol(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Indicators.realizedVol(
      priceSeries(s, dir), "user_id", "ts", "cents",
      bucket = date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .withColumnRenamed("bucket", "day")

  val q182Sql: String =
    """WITH px AS (SELECT user_id, ts,
      |    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |r0 AS (SELECT user_id, day, ts,
      |    cents - lag(cents) OVER (PARTITION BY user_id, day ORDER BY ts)
      |      AS r FROM px),
      |r AS (SELECT user_id, day, r,
      |    lag(abs(r)) OVER (PARTITION BY user_id, day ORDER BY ts) AS rp
      |  FROM r0)
      |SELECT user_id, day, count(*) AS n_ret,
      |  CAST(sum(r * r) AS BIGINT) AS rv,
      |  CAST(sum(CASE WHEN rp IS NOT NULL THEN abs(r) * rp ELSE 0 END)
      |    AS BIGINT) AS bv,
      |  CASE WHEN sum(r * r) > 0 THEN CAST(round(
      |    CAST(sum(CASE WHEN rp IS NOT NULL THEN abs(r) * rp ELSE 0 END)
      |      AS DOUBLE) / CAST(sum(r * r) AS DOUBLE) * 1e6) AS BIGINT)
      |  END AS bv_ratio_micro
      |FROM r WHERE r IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** Long–short momentum backtest ([[graft.ticks.Backtest
    * .longShortTopK]]): top-10 long / bottom-10 short by trailing
    * 5-day delta per day, next-period spread P&L and the cumulative
    * curve via the distributed prefix sum (GlobalOrder — never a
    * single-partition window, even on a day-level relation).
    */
  def q183LongShort(s: SparkSession, dir: String): DataFrame =
    graft.ticks.Backtest.longShortTopK(
      dailyClose(s, dir), "user_id", "day", "cents", lookback = 5, k = 10)
      .select(col("day"), col("n_long"), col("n_short"),
        col("spread_cents"), col("cum_spread_cents"))

  val q183Sql: String =
    s"""WITH px AS ($dailyCloseSql),
      |e AS (SELECT user_id, day, cents,
      |    cents - lag(cents, 5) OVER w AS mom,
      |    lead(cents, 1) OVER w - cents AS fwd
      |  FROM px WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |f AS (SELECT * FROM e WHERE mom IS NOT NULL AND fwd IS NOT NULL),
      |r AS (SELECT *,
      |    row_number() OVER (PARTITION BY day ORDER BY mom DESC, user_id)
      |      AS rt,
      |    row_number() OVER (PARTITION BY day ORDER BY mom ASC, user_id DESC)
      |      AS rb
      |  FROM f),
      |d AS (SELECT day,
      |    CAST(sum(CASE WHEN rt <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
      |    CAST(sum(CASE WHEN rb <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
      |    CAST(sum(CASE WHEN rt <= 10 THEN fwd ELSE 0 END)
      |      + sum(CASE WHEN rb <= 10 THEN -fwd ELSE 0 END) AS BIGINT)
      |      AS spread_cents
      |  FROM r WHERE rt <= 10 OR rb <= 10 GROUP BY 1)
      |SELECT day, n_long, n_short, spread_cents,
      |  CAST(sum(spread_cents) OVER (ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_spread_cents
      |FROM d""".stripMargin

  val queries: Map[String, Q] = Map(
    "q182_realized_vol" -> (q182RealizedVol _),
    "q183_long_short" -> (q183LongShort _),
    "q180_pair_spread" -> (q180PairSpread _),
    "q181_weekday_effect" -> (q181WeekdayEffect _),
    "q176_flow_imbalance" -> (q176FlowImbalance _),
    "q177_kyle_lambda" -> (q177KyleLambda _),
    "q174_split_adjust" -> (q174SplitAdjust _),
    "q175_nbbo" -> (q175Nbbo _),
    "q169_var_historical" -> (q169HistoricalVar _),
    "q170_momentum_backtest" -> (q170Momentum _),
    "q153_cusum" -> (q153Cusum _),
    "q157_trailing_agg" -> (q157TrailingAgg _),
    "q159_drawdown" -> (q159Drawdown _),
    "q160_ewma" -> (q160Ewma _),
    "q161_bollinger" -> (q161Bollinger _),
    "q162_rsi" -> (q162Rsi _))

  val oracleSql: Map[String, String] = Map(
    "q182_realized_vol" -> q182Sql,
    "q183_long_short" -> q183Sql,
    "q180_pair_spread" -> q180Sql,
    "q181_weekday_effect" -> q181Sql,
    "q176_flow_imbalance" -> q176Sql,
    "q177_kyle_lambda" -> q177Sql,
    "q174_split_adjust" -> q174Sql,
    "q175_nbbo" -> q175Sql,
    "q169_var_historical" -> q169Sql,
    "q170_momentum_backtest" -> q170Sql,
    "q153_cusum" -> q153Sql,
    "q157_trailing_agg" -> q157Sql,
    "q159_drawdown" -> q159Sql,
    "q160_ewma" -> q160Sql,
    "q161_bollinger" -> q161Sql,
    "q162_rsi" -> q162Sql)
}
