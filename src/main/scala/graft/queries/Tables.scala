package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet fixtures (TESTDATA.md). */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = apply(s, dir, "region")
  /** events.ts is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects; read it as epoch-nanos long (`ts_ns`) and expose a
    * microsecond-truncated TimestampType `ts` alongside.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // single home of the precision-critical ns→µs truncation rule
      .withColumn("ts", graft.ticks.MinuteBars.truncateNanos(
        org.apache.spark.sql.functions.col("ts_ns")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
