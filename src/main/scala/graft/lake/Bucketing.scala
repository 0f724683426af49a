package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for shuffle-free co-located joins (the 100 TB answer to
  * the reference's repeated orderkey-style joins): write both fact tables
  * bucketed by the join key; Spark's sort-merge join then reads buckets
  * pairwise with NO exchange on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed + sorted managed table.
    *
    * Drops any prior table AND its on-disk location first: with the default
    * in-memory catalog a fresh session forgets the table while its warehouse
    * directory survives, and `mode("overwrite")` alone then fails with
    * LOCATION_ALREADY_EXISTS instead of overwriting.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — plans as a sort-merge
    * join with zero Exchange operators when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
