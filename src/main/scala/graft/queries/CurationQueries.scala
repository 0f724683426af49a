package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 curation-depth queries: semantic dedup (SemDeDup), file-skipping
  * stats pruning, URL canonicalization, column profiling, and fixed-round
  * PageRank. Each gate replays end to end in DuckDB.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  private def rm(s: SparkSession, paths: String*): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    paths.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  /** SemDeDup ([[graft.operators.SemDedup]]): the corpus is embeddings plus
    * planted clones (every vec_id % 10 == 3 re-enters as id + 1,000,000 with
    * the vector scaled by 1.5 — float-rounded exactly the same way by both
    * engines, cosine ≈ 1 with its base, far above tau = 0.9, while genuine
    * non-dup pairs sit below ~0.7). Cells come from the q54 seed rule
    * (vec_id % 100 == 50), so assignment, within-cell pairing, and the
    * keep-lowest-id verdict all replay in SQL. Every clone must be dropped
    * IF it lands in its base's cell — and with exact-scaled clones the
    * cosine-to-centroid chain is near-identical, so they do; a clone
    * surviving, or an extra drop, breaks the hash.
    */
  def q135SemDedup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val clones = base.filter(col("vec_id") % 10 === 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => (x.cast("double") * 1.5).cast("float"))
          .as("embedding"))
    val corpus = base.unionByName(clones)
    val cents = base.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    graft.operators.SemDedup.dedup(corpus, cents, tau = 0.9)
  }

  val q135Sql: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings),
      |aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    CAST(list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT)) AS DOUBLE[])
      |  FROM base WHERE vec_id % 10 = 3),
      |cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM base WHERE vec_id % 100 = 50),
      |assign AS (SELECT vec_id, v, cell FROM (
      |    SELECT a.vec_id, a.v, c.cell,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_dot_product(a.v, c.cv) /
      |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM aug a, cents c) WHERE rn = 1),
      |dup AS (
      |  SELECT b.vec_id, count(*) AS n_dup_lower
      |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9
      |  GROUP BY 1)
      |SELECT s.vec_id, s.cell, coalesce(d.n_dup_lower, 0) AS n_dup_lower,
      |  CAST(coalesce(d.n_dup_lower, 0) = 0 AS INT) AS kept
      |FROM assign s LEFT JOIN dup d USING (vec_id)""".stripMargin

  /** File-skipping stats pruning ([[graft.lake.FileStats]]): orders is
    * written range-clustered on o_orderdate into 8 files with a per-file
    * min/max manifest; a 12-month range query then reads ONLY the files
    * whose range intersects (the spec asserts the candidate set shrinks —
    * the boundary split is sample-dependent, so the file COUNT stays out of
    * the oracle). The gate is the result-invariance contract: pruned read ≡
    * unpruned filter, so an off-by-one in the intersection test (dropping a
    * boundary file) or a stats bug breaks the hash.
    */
  def q136FileSkipping(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q136_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    val orders = Tables.orders(s, dir)
    graft.lake.FileStats.writeWithStats(orders, s"$root/orders",
      "o_orderdate", numFiles = 8)
    val lo = lit("1995-06-01").cast("timestamp_ntz")
    val hi = lit("1996-05-31").cast("timestamp_ntz")
    graft.lake.FileStats.readRange(s, s"$root/orders", "o_orderdate", lo, hi)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
  }

  val q136Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
      |  min(o_orderdate) AS first_date,
      |  max(o_orderdate) AS last_date
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1995-06-01' AND TIMESTAMP '1996-05-31'
      |GROUP BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q135_semdedup" -> (q135SemDedup _),
    "q136_file_skipping" -> (q136FileSkipping _))

  val oracleSql: Map[String, String] = Map(
    "q135_semdedup" -> q135Sql,
    "q136_file_skipping" -> q136Sql)
}
