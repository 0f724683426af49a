package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ExactAgg._

/** Core relational operators from SURVEY.md §2 (P/J/A/W/O/U families),
  * exercised over the driver fixtures with DuckDB-checkable semantics.
  *
  * Determinism rules applied throughout (they matter at 1000-executor scale,
  * where reduction order is nondeterministic):
  *  - money sums via ExactAgg (integer-cents, order-independent);
  *  - every top-k / dedup has a total-order tiebreak;
  *  - timestamps are truncated/cast where source precision (ns) exceeds
  *    Spark's microsecond resolution.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/A4/A5/F3 — pricing summary (TPC-H Q1 shape): wide aggregation with
    * map-side partial agg; scales linearly, no skew (6 groups). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("date"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        fixedSum($"l_extendedprice", 2).as("sum_base_price"),
        fixedSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
        (fixedSum($"l_quantity", 0) / count(lit(1))).as("avg_qty"),
        (fixedSum($"l_extendedprice", 2) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
      |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT))/10000.0 AS sum_disc_price,
      |  (sum(CAST(round(l_quantity) AS BIGINT))/1.0)/count(*) AS avg_qty,
      |  (sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0)/count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= CAST('1998-09-02' AS DATE)
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** P1/P2/F3 — projection + cast + arithmetic + date-range filter, all pushed
    * to the parquet scan (PushedFilters + pruned ReadSchema). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate".between(lit("1995-01-01").cast("date"), lit("1995-03-31").cast("date")) &&
        $"l_discount" > lit(0.05))
      .select(
        $"l_orderkey", $"l_linenumber",
        // dates surface as ISO strings at the edge (reference policy,
        // SURVEY §7.5 risk 1) — also dtype-stable across engines
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_date"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"),
        $"l_quantity".cast("long").as("qty"))
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
      |  l_extendedprice*(1.0-l_discount) AS net_price,
      |  CAST(l_quantity AS BIGINT) AS qty
      |FROM lineitem
      |WHERE l_shipdate BETWEEN CAST('1995-01-01' AS DATE) AND CAST('1995-03-31' AS DATE)
      |  AND l_discount > 0.05""".stripMargin

  /** J-family + A4 — 4-way star join (customer⋈orders⋈lineitem⋈nation) with
    * broadcast dims; revenue per nation. At 100 TB: nation/customer broadcast,
    * orders⋈lineitem co-partitioned on orderkey. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        fixedSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q3Sql: String =
    """SELECT n_name,
      |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT))/10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** O1 — top-k by aggregate (the reference's top-3000 liquidity ranking,
    * universe/manager.py:229-235): TakeOrderedAndProject, no global sort.
    * Total-order tiebreak on custkey for determinism under ties. */
  def q4TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(fixedSum($"o_totalprice", 2).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy($"total_spend".desc, $"o_custkey".asc)
      .limit(10)
  }

  val q4Sql: String =
    """SELECT o_custkey,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total_spend,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY total_spend DESC, o_custkey ASC
      |LIMIT 10""".stripMargin

  /** W1 — lag-1 per entity (the reference's rev_grw = rev - lag(rev), derived/
    * metrics.py:187-194). Window partitioned by customer → shuffles once on
    * custkey; deterministic total order (date, orderkey). */
  def q5WindowLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"order_date", $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"), $"o_totalprice")
      .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
      .withColumn("price_delta", $"o_totalprice" - lag($"o_totalprice", 1).over(w))
      .withColumn("order_date", date_format($"order_date", "yyyy-MM-dd"))
  }

  val q5Sql: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  o_totalprice - lag(o_totalprice, 1) OVER w AS price_delta
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)""".stripMargin

  /** W3 — rolling 4-row sum per entity (the reference's TTM over quarterly
    * rows, derived/ttm.py:111-147): emit only complete windows. Rolling sum
    * accumulated in integer cents → order-independent. */
  def q6RollingTtm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"order_date", $"o_orderkey")
      .rowsBetween(-3, 0)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("order_date"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .withColumn("ttm_spend", sum($"cents").over(w) / 100.0)
      .withColumn("n_in_window", count(lit(1)).over(w))
      .filter($"n_in_window" === 4)
      .select($"o_custkey", $"o_orderkey",
        date_format($"order_date", "yyyy-MM-dd").as("order_date"), $"ttm_spend")
  }

  val q6Sql: String =
    """SELECT o_custkey, o_orderkey, strftime(order_date, '%Y-%m-%d') AS order_date, ttm_spend FROM (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |    sum(CAST(round(o_totalprice*100) AS BIGINT))
      |      OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 100.0 AS ttm_spend,
      |    count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_in_window
      |  FROM orders) t
      |WHERE n_in_window = 4""".stripMargin

  /** A2/W6 — dedup keep-latest per key (the reference's sort-then-
    * drop_duplicates, master/security_master.py:411-422): row_number over a
    * deterministic total order. events.ts is ns-precision → compare via
    * event_id tiebreak and emit epoch millis. */
  def q7DedupLatest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
  }

  val q7Sql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin

  /** J9/U3 — set logic on key universes (the reference's appeared/disappeared
    * diffing, security_master.py:1246-1259): EXCEPT via left_anti join (no
    * full-table distinct shuffle beyond the join). */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val y95 = o.filter(year($"o_orderdate") === 1995).select($"o_custkey").distinct()
    val y96 = o.filter(year($"o_orderdate") === 1996).select($"o_custkey").distinct()
    y95.join(y96, Seq("o_custkey"), "left_anti")
      .select($"o_custkey".as("churned_custkey"))
  }

  val q8Sql: String =
    """SELECT o_custkey AS churned_custkey FROM orders WHERE year(o_orderdate)=1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996""".stripMargin

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_topk" -> (q4TopK _),
    "q5_window_lag" -> (q5WindowLag _),
    "q6_rolling_ttm" -> (q6RollingTtm _),
    "q7_dedup_latest" -> (q7DedupLatest _),
    "q8_setops" -> (q8SetOps _))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_topk" -> q4Sql,
    "q5_window_lag" -> q5Sql,
    "q6_rolling_ttm" -> q6Sql,
    "q7_dedup_latest" -> q7Sql,
    "q8_setops" -> q8Sql)
}
