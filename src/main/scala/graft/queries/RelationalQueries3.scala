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
      .select(col("o_custkey"), col("yr"),
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

  /** A12 — approximate distinct (HLL++) next to the exact count (rows-only:
    * sketch estimates are engine-specific; the relative-error contract is
    * asserted in the spec instead).
    */
  def q47ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count_distinct(col("l_partkey")).as("exact_parts"))

  val queries: Map[String, Q] = Map(
    "q46_q4_derivation" -> (q46Q4Derivation _),
    "q47_approx_distinct" -> (q47ApproxDistinct _))

  val oracleSql: Map[String, String] = Map(
    "q46_q4_derivation" -> q46Sql)
}
