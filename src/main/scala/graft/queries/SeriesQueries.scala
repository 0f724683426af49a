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

  val queries: Map[String, Q] = Map(
    "q153_cusum" -> (q153Cusum _),
    "q157_trailing_agg" -> (q157TrailingAgg _))

  val oracleSql: Map[String, String] = Map(
    "q153_cusum" -> q153Sql,
    "q157_trailing_agg" -> q157Sql)
}
