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
  /** events.ts has shipped in two fixture generations: nanosecond-precision
    * parquet (which Spark's vectorized reader only admits as epoch-nanos
    * long via `nanosAsLong`) and, in newer fixtures, plain `timestamp[us]`
    * (surfacing as TIMESTAMP_NTZ). Normalize both to the same two-column
    * contract every consumer relies on: `ts_ns` = epoch-nanos LongType and
    * `ts` = µs-precision TimestampType. DuckDB's `epoch_ns(ts)` oracle side
    * agrees with either generation (ns natively; µs×1000 for the new one).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = apply(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // ns-precision fixture read as epoch-nanos long
        raw.withColumnRenamed("ts", "ts_ns")
          // single home of the precision-critical ns→µs truncation rule
          .withColumn("ts", graft.ticks.MinuteBars.truncateNanos(col("ts_ns")))
      case _ => // µs-precision fixture (TIMESTAMP or TIMESTAMP_NTZ)
        // NTZ→instant under the session zone (UTC in Verify/Bench), matching
        // DuckDB's naive-timestamp epoch_ns interpretation exactly
        val ts = col("ts").cast(TimestampType)
        // same column order as the legacy branch: ts_ns in ts's slot, ts last
        raw.select(raw.columns.map {
          case "ts" => (unix_micros(ts) * 1000L).as("ts_ns")
          case c    => col(c)
        } :+ ts.as("ts"): _*)
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
