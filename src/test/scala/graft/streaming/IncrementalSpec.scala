package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 10.0),
      (2L, "2024-01-01 10:05:00", 1L, "purchase", 20.0),
      (2L, "2024-01-01 10:05:00", 1L, "purchase", 20.0), // duplicate event_id
      (3L, "2024-01-01 11:30:00", 2L, "error", 5.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("watermarked dedup-append drops duplicate keys (I4)") {
    val stream = Incremental.fileStream(spark, dir, schema)
    val deduped = Incremental.dedupAppend(stream, "ts", "event_id")
    Incremental.runAvailableNow(deduped, "dedup_out")
    val got = spark.table("dedup_out")
    assert(got.count() === 3)
    assert(got.select("event_id").distinct().count() === 3)
  }

  test("re-delivery of a key with a DIFFERENT timestamp is still a duplicate") {
    val d2 = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    Seq(
      (7L, "2024-01-01 10:00:00", 1L, "purchase", 10.0),
      (7L, "2024-01-01 10:00:01", 1L, "purchase", 10.0)) // same accession, 1s later
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(d2)
    val deduped = Incremental.dedupAppend(
      Incremental.fileStream(spark, d2, schema), "ts", "event_id")
    Incremental.runAvailableNow(deduped, "dedup_redeliver")
    assert(spark.table("dedup_redeliver").count() === 1)
  }

  test("windowed aggregation matches the batch computation") {
    val stream = Incremental.fileStream(spark, dir, schema)
    val windowed = Incremental.windowedCounts(stream, "ts", "1 hour", Some("2 hours"), Seq("event_type"))
    // complete mode: append would hold windows open until the watermark
    // passes, which never happens for the newest window in a bounded run
    Incremental.runAvailableNow(windowed, "win_out", outputMode = "complete")
    val got = spark.table("win_out")
      .select($"event_type", $"n", $"value_sum").as[(String, Long, Double)]
      .collect().toSet
    // batch equivalent (duplicate row included — dedup is a separate op)
    val batch = spark.read.parquet(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), (sum(round($"value" * 100).cast("long")) / 100.0).as("v"))
      .select($"event_type", $"n", $"v").as[(String, Long, Double)].collect().toSet
    assert(got === batch)
    assert(got === Set(("purchase", 3L, 50.0), ("error", 1L, 5.0)))
  }

  test("AvailableNow picks up files added between runs (incremental I1/I3)") {
    val stream = Incremental.fileStream(spark, dir, schema)
    val deduped = Incremental.dedupAppend(stream, "ts", "event_id")
    Incremental.runAvailableNow(deduped, "incr_out")
    val n1 = spark.table("incr_out").count()
    // late file lands
    Seq((9L, "2024-01-01 12:00:00", 3L, "signup", 1.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      .write.mode("append").parquet(dir)
    val stream2 = Incremental.fileStream(spark, dir, schema)
    Incremental.runAvailableNow(
      Incremental.dedupAppend(stream2, "ts", "event_id"), "incr_out2")
    assert(spark.table("incr_out2").count() === n1 + 1)
  }
}
