package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ExactAgg._
import graft.functions.SafeArith._
import graft.operators.AsOfJoin

/** Second operator batch: as-of joins, interval joins, pivot/melt, JSON,
  * scalar function families, cumulative windows, schema-evolving unions,
  * calendar spines (SURVEY.md §2 J/A/W/F families).
  */
object RelationalQueries2 {

  type Q = (SparkSession, String) => DataFrame

  /** J4 — backward as-of join via [[graft.operators.AsOfJoin]]: every
    * purchase event gets the user's most recent prior-or-same error value.
    * Time axis is raw epoch-nanos (exact source precision, no tie ambiguity).
    * Oracle: DuckDB native ASOF JOIN.
    */
  def q9AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ns").as("err_ts"), col("value").as("last_error_value"))
    AsOfJoin.backward(purchases, errors,
        keys = Seq("user_id"), leftOn = "ts_ns", rightOn = "err_ts",
        rightCols = Seq("last_error_value"))
      .select(col("event_id"), col("user_id"), col("value"), col("last_error_value"))
  }

  val q9Sql: String =
    """SELECT p.event_id, p.user_id, p.value, e.value AS last_error_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.ts >= e.ts""".stripMargin

  /** J4 breadth — FORWARD as-of join ([[AsOfJoin.forward]]): each
    * purchase picks up the NEXT error at or after it (polars
    * `strategy="forward"`; the reference uses backward only — this
    * completes the strategy family). Same union-window shape, time order
    * reversed; DuckDB's ASOF with `<=` is the native oracle.
    */
  def q155AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ns").as("err_ts"), col("value").as("next_error_value"))
    AsOfJoin.forward(purchases, errors,
        keys = Seq("user_id"), leftOn = "ts_ns", rightOn = "err_ts",
        rightCols = Seq("next_error_value"))
      .select(col("event_id"), col("user_id"), col("value"), col("next_error_value"))
  }

  val q155Sql: String =
    """SELECT p.event_id, p.user_id, p.value, e.value AS next_error_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.ts <= e.ts""".stripMargin

  /** J4 breadth — NEAREST as-of join ([[AsOfJoin.nearest]]): the closer
    * of the backward/forward candidates wins, equal distance → backward.
    * Both candidates come from ONE shuffled union (same partitioning,
    * two sort orders). The oracle composes two DuckDB ASOF joins and
    * replays the distance comparison in epoch microseconds.
    */
  def q156AsofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ns").as("err_ts"), col("value").as("nearest_error_value"))
    AsOfJoin.nearest(purchases, errors,
        keys = Seq("user_id"), leftOn = "ts_ns", rightOn = "err_ts",
        rightCols = Seq("nearest_error_value"))
      .select(col("event_id"), col("user_id"), col("value"), col("nearest_error_value"))
  }

  val q156Sql: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |err AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error'),
      |b AS (SELECT p.event_id, e.ts AS bts, e.value AS bval
      |  FROM p ASOF LEFT JOIN err e
      |  ON p.user_id = e.user_id AND p.ts >= e.ts),
      |f AS (SELECT p.event_id, e.ts AS fts, e.value AS fval
      |  FROM p ASOF LEFT JOIN err e
      |  ON p.user_id = e.user_id AND p.ts <= e.ts)
      |SELECT p.event_id, p.user_id, p.value,
      |  CASE WHEN b.bts IS NULL THEN f.fval
      |       WHEN f.fts IS NULL THEN b.bval
      |       WHEN epoch_us(p.ts) - epoch_us(b.bts)
      |            <= epoch_us(f.fts) - epoch_us(p.ts) THEN b.bval
      |       ELSE f.fval END AS nearest_error_value
      |FROM p JOIN b ON b.event_id = p.event_id
      |JOIN f ON f.event_id = p.event_id""".stripMargin

  /** J1/J7 — interval-containment join against a broadcast temporal dimension
    * (the SecurityMaster lookup shape): each nation carries a validity
    * interval derived from its key; orders match if orderdate falls inside.
    */
  def q10IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.nation(s, dir).select(
      col("n_nationkey"), col("n_name"),
      add_months(lit("1995-01-01").cast("date"), col("n_nationkey")).as("start_date"),
      date_sub(add_months(add_months(lit("1995-01-01").cast("date"), col("n_nationkey")), 12), 1).as("end_date"))
    val oc = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
    oc.join(broadcast(dim),
        col("c_nationkey") === col("n_nationkey") &&
          col("o_orderdate").cast("date").between(col("start_date"), col("end_date")))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        fixedSum(col("o_totalprice"), 2).as("interval_revenue"))
  }

  val q10Sql: String =
    """WITH dim AS (
      |  SELECT n_nationkey, n_name,
      |    DATE '1995-01-01' + n_nationkey * INTERVAL 1 MONTH AS start_date,
      |    DATE '1995-01-01' + (n_nationkey + 12) * INTERVAL 1 MONTH - INTERVAL 1 DAY AS end_date
      |  FROM nation)
      |SELECT n_name, count(*) AS n_orders,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS interval_revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN dim ON c_nationkey = n_nationkey
      |  AND CAST(o_orderdate AS DATE) BETWEEN CAST(start_date AS DATE) AND CAST(end_date AS DATE)
      |GROUP BY n_name""".stripMargin

  /** A7 — pivot long→wide (the reference's EAV pivot, derived/metrics.py:76-81):
    * per-user event-type totals, integer-cents exact. Explicit pivot values →
    * stable output schema (required for a 100 TB plan: no driver-side
    * distinct scan to discover columns).
    */
  def q11Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(coalesce(sum(col("cents")), lit(0L)))
      .select(col("user_id") +: types.map(t => (col(t) / 100.0).as(s"${t}_total")): _*)
  }

  val q11Sql: String =
    """SELECT user_id,
      |  coalesce(sum(CASE WHEN event_type='click' THEN CAST(round(value*100) AS BIGINT) END), 0)/100.0 AS click_total,
      |  coalesce(sum(CASE WHEN event_type='error' THEN CAST(round(value*100) AS BIGINT) END), 0)/100.0 AS error_total,
      |  coalesce(sum(CASE WHEN event_type='purchase' THEN CAST(round(value*100) AS BIGINT) END), 0)/100.0 AS purchase_total,
      |  coalesce(sum(CASE WHEN event_type='signup' THEN CAST(round(value*100) AS BIGINT) END), 0)/100.0 AS signup_total,
      |  coalesce(sum(CASE WHEN event_type='view' THEN CAST(round(value*100) AS BIGINT) END), 0)/100.0 AS view_total
      |FROM events GROUP BY user_id""".stripMargin

  /** A8 — melt wide→long (the reference's metrics melt, metrics.py:231-237):
    * lineitem price components unpivoted to (measure, value) rows.
    */
  def q12Unpivot(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "value")
  }

  val q12Sql: String =
    """SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS value
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin

  /** F5/S5 — JSON extraction (the reference's EDGAR facts traversal,
    * collection/fundamental.py:47-120): parse `props` JSON, aggregate the
    * extracted field. get_json_object is codegen'd — no UDF.
    */
  def q13Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(when(col("k").isNull, 1)).as("null_k"),
        count(lit(1)).as("n"))

  val q13Sql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) IS NULL THEN 1 END) AS null_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** F1 — string function family (reference SymbolNormalizer + CIK padding,
    * security_master.py:157-175,1335): upper, regexp_replace, lpad, substring,
    * startswith, concat.
    */
  def q14StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        regexp_replace(col("c_name"), "[#.\\-]", "").as("squeezed"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("cik_style"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        col("c_name").startsWith("Customer").cast("int").as("is_customer"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"))

  val q14Sql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS upper_name,
      |  regexp_replace(c_name, '[#.\-]', '', 'g') AS squeezed,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cik_style,
      |  substring(c_name, 1, 8) AS prefix8,
      |  CAST(starts_with(c_name, 'Customer') AS INT) AS is_customer,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged
      |FROM customer""".stripMargin

  /** F2 — date/time function family (reference alpaca_ticks.py:45-67,
    * crsp_ticks.py:840-848): year/quarter/month extraction, month start/end
    * math, ISO formatting.
    */
  def q15DateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        date_format(trunc(col("o_orderdate"), "month"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"))

  val q15Sql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y,
      |  quarter(o_orderdate) AS q,
      |  month(o_orderdate) AS m,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
      |FROM orders""".stripMargin

  /** F4 — safe arithmetic parity (reference derived/metrics.py:93-106):
    * division by zero and null propagation both yield null, never an error.
    * (l_quantity - 25) hits 0 on real rows.
    */
  def q16SafeArith(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 50 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        safeDivide(col("l_extendedprice"), col("l_quantity") - 25).as("per_unit_off25"),
        safeSubtract(col("l_extendedprice"), col("l_tax") * col("l_extendedprice")).as("after_tax"),
        safeAdd(col("l_discount"), col("l_tax")).as("disc_plus_tax"),
        safeMultiply(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("net"))

  val q16Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN (l_quantity - 25) IS NOT NULL AND (l_quantity - 25) <> 0
      |       THEN l_extendedprice / (l_quantity - 25) END AS per_unit_off25,
      |  CASE WHEN l_extendedprice IS NOT NULL AND (l_tax * l_extendedprice) IS NOT NULL
      |       THEN l_extendedprice - l_tax * l_extendedprice END AS after_tax,
      |  CASE WHEN l_discount IS NOT NULL AND l_tax IS NOT NULL
      |       THEN l_discount + l_tax END AS disc_plus_tax,
      |  CASE WHEN l_extendedprice IS NOT NULL AND (1.0 - l_discount) IS NOT NULL
      |       THEN l_extendedprice * (1.0 - l_discount) END AS net
      |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin

  /** F6 — conditional routing (reference source routing by year,
    * collectors.py:91-133, and CIK coalesce, security_master.py:470-476).
    */
  def q17Conditional(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(year(col("o_orderdate")) < 1995, "crsp")
          .when(col("o_orderstatus") === "O", "alpaca_open")
          .otherwise("alpaca").as("source"),
        coalesce(
          when(col("o_totalprice") > 200000, col("o_totalprice")),
          lit(0.0)).as("big_or_zero"))

  val q17Sql: String =
    """SELECT o_orderkey,
      |  CASE WHEN year(o_orderdate) < 1995 THEN 'crsp'
      |       WHEN o_orderstatus = 'O' THEN 'alpaca_open'
      |       ELSE 'alpaca' END AS source,
      |  coalesce(CASE WHEN o_totalprice > 200000 THEN o_totalprice END, 0.0) AS big_or_zero
      |FROM orders""".stripMargin

  /** A1 — grouped collect_set (the reference's ciks-per-period grouping,
    * security_master.py:542-556), emitted as a sorted joined string for
    * engine-agnostic comparison; plus min/max aggregates.
    */
  def q18GroupCollect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        count_distinct(col("c_mktsegment")).as("n_segments"))

  val q18Sql: String =
    """SELECT c_nationkey,
      |  array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
      |  min(c_acctbal) AS min_bal,
      |  max(c_acctbal) AS max_bal,
      |  count(DISTINCT c_mktsegment) AS n_segments
      |FROM customer GROUP BY c_nationkey""".stripMargin

  /** W4 — running cumulative sum per entity (the reference's security_id
    * cumsum assignment, security_master.py:558-593): integer-cents running
    * total per user over the exact ns time axis.
    */
  def q19Cumsum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .withColumn("running_value", sum(round(col("value") * 100).cast("long")).over(w) / 100.0)
      .select(col("event_id"), col("user_id"), col("running_value"))
  }

  val q19Sql: String =
    """SELECT event_id, user_id,
      |  sum(CAST(round(value*100) AS BIGINT))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_value
      |FROM events""".stripMargin

  /** U2 — schema-evolving union (the reference's diagonal concat for new-IPO
    * rows, security_master.py:970): 1995 orders lack a column that 1996
    * orders carry; unionByName fills missing with null.
    */
  def q20UnionByName(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val a = o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_orderkey"), col("o_totalprice"))
    val b = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    a.unionByName(b, allowMissingColumns = true)
  }

  val q20Sql: String =
    """SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      |FROM orders WHERE year(o_orderdate) = 1995
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders WHERE year(o_orderdate) = 1996""".stripMargin

  /** J5 — calendar-spine left join (reference utils/mapping.py:24-88): every
    * day of 1995-H1 gets its order count, zero-filled on empty days —
    * the calendar-alignment shape that surfaces halts as null rows.
    */
  def q21CalendarSpine(s: SparkSession, dir: String): DataFrame = {
    val spine = s.sql(
      "SELECT explode(sequence(DATE'1995-01-01', DATE'1995-06-30', INTERVAL 1 DAY)) AS day")
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    spine.join(daily, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"))
  }

  val q21Sql: String =
    """SELECT strftime(spine.day, '%Y-%m-%d') AS day, coalesce(d.cnt, 0) AS n_orders
      |FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-06-30', INTERVAL 1 DAY)) AS DATE) AS day) spine
      |LEFT JOIN (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
      |           FROM orders GROUP BY 1) d USING (day)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q9_asof_join" -> (q9AsofJoin _),
    "q10_interval_join" -> (q10IntervalJoin _),
    "q11_pivot" -> (q11Pivot _),
    "q12_unpivot" -> (q12Unpivot _),
    "q13_json" -> (q13Json _),
    "q14_string_funcs" -> (q14StringFuncs _),
    "q15_date_funcs" -> (q15DateFuncs _),
    "q16_safe_arith" -> (q16SafeArith _),
    "q17_conditional" -> (q17Conditional _),
    "q18_group_collect" -> (q18GroupCollect _),
    "q19_cumsum" -> (q19Cumsum _),
    "q20_union_by_name" -> (q20UnionByName _),
    "q21_calendar_spine" -> (q21CalendarSpine _),
    "q155_asof_forward" -> (q155AsofForward _),
    "q156_asof_nearest" -> (q156AsofNearest _))

  val oracleSql: Map[String, String] = Map(
    "q9_asof_join" -> q9Sql,
    "q10_interval_join" -> q10Sql,
    "q11_pivot" -> q11Sql,
    "q12_unpivot" -> q12Sql,
    "q13_json" -> q13Sql,
    "q14_string_funcs" -> q14Sql,
    "q15_date_funcs" -> q15Sql,
    "q16_safe_arith" -> q16Sql,
    "q17_conditional" -> q17Sql,
    "q18_group_collect" -> q18Sql,
    "q19_cumsum" -> q19Sql,
    "q20_union_by_name" -> q20Sql,
    "q21_calendar_spine" -> q21Sql,
    "q155_asof_forward" -> q155Sql,
    "q156_asof_nearest" -> q156Sql)
}
