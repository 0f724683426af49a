package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins (the 100 TB answer to
  * the reference's repeated orderkey-style joins): write both fact tables
  * bucketed by the join key; Spark's sort-merge join then reads buckets
  * pairwise with NO exchange on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed + sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans as a sort-merge
    * join with zero Exchange operators when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
