package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** API-surface breadth: the same engine driven through `spark.sql` (ANSI SQL
  * over registered views) and through the typed `Dataset[T]` API — both
  * compile to identical Catalyst plans as the DataFrame forms, demonstrated
  * by sharing oracles with first-principles SQL.
  */
object ApiQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The SQL string interface: register views, run a join+agg through the
    * parser (the reference has no SQL surface — Catalyst gives it for free).
    */
  def q50SqlInterface(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    // NB: in Spark SQL the literal 100.0 is DECIMAL (DataFrame lit(100.0) is
    // DOUBLE) — cast explicitly or the result type diverges from the oracle
    s.sql(
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  sum(CAST(round(o_totalprice*100) AS BIGINT))/CAST(100 AS DOUBLE) AS segment_revenue
        |FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY c_mktsegment""".stripMargin)
  }

  val q50Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS segment_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus <> 'F'
      |GROUP BY c_mktsegment""".stripMargin

  /** Typed Dataset API: case-class Encoders, typed filter/map, then back to
    * the relational surface for aggregation (compile-time field checks where
    * they help; Catalyst plan identical to the untyped form).
    */
  def q51TypedDataset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .as[Supplier]
    ds.filter(_.s_acctbal > 0)
      .map(sp => (sp.s_nationkey, math.round(sp.s_acctbal * 100)))
      .toDF("nation", "cents")
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        (sum(col("cents")) / 100.0).as("positive_balance"))
  }

  val q51Sql: String =
    """SELECT s_nationkey AS nation, count(*) AS n_suppliers,
      |  sum(CAST(round(s_acctbal*100) AS BIGINT))/100.0 AS positive_balance
      |FROM supplier WHERE s_acctbal > 0
      |GROUP BY s_nationkey""".stripMargin

  /** The native Catalyst kernels exposed as SQL functions
    * ([[graft.expressions.GraftFunctions]]): cosine over a sparse id-offset
    * pairing, run entirely through the SQL parser.
    */
  def q52bSqlNativeFunction(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.registerAll(s)
    Tables.embeddings(s, dir).createOrReplaceTempView("v_emb")
    s.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(cosine_sim(a.embedding, b.embedding), 9) AS cos_r
        |FROM v_emb a JOIN v_emb b ON a.vec_id + 100 = b.vec_id""".stripMargin)
  }

  val q52bSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) AS cos_r
      |FROM e a JOIN e b ON a.vec_id + 100 = b.vec_id""".stripMargin

  /** S8 through a custom DataSourceV2 connector
    * ([[graft.sources.PsvDataSource]]): stage the customer universe as a
    * pipe-delimited header file, read it back through the connector with an
    * EqualTo filter and column pruning pushed INTO the partition reader,
    * and aggregate. The oracle replays the cents math from the parquet
    * table directly — the text round-trip must be value-preserving.
    * Numerics travel as integer-cents strings (a double would re-enter via
    * engine-specific decimal formatting).
    */
  def q83Dsv2Source(s: SparkSession, dir: String): DataFrame = {
    val out = "/tmp/graft_psv_universe"
    Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_mktsegment"), col("c_nationkey").cast("int").as("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
      .repartition(1)
      .write.mode("overwrite")
      .option("sep", "|").option("header", "true").csv(out)
    s.read.format("graft.sources.PsvDataSource").load(out)
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("acctbal_cents").cast("long")).as("bal_cents"))
      .select(col("c_nationkey").cast("int").as("nationkey"),
        col("n_customers"), col("bal_cents"))
  }

  val q83Sql: String =
    """SELECT CAST(c_nationkey AS INT) AS nationkey, count(*) AS n_customers,
      |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM customer WHERE c_mktsegment = 'BUILDING'
      |GROUP BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q50_sql_interface" -> (q50SqlInterface _),
    "q51_typed_dataset" -> (q51TypedDataset _),
    "q53_sql_native_function" -> (q52bSqlNativeFunction _),
    "q83_dsv2_source" -> (q83Dsv2Source _))

  val oracleSql: Map[String, String] = Map(
    "q50_sql_interface" -> q50Sql,
    "q51_typed_dataset" -> q51Sql,
    "q53_sql_native_function" -> q52bSql,
    "q83_dsv2_source" -> q83Sql)
}

case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
