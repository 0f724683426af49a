package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixture schema contract: regenerated fixtures with drifted physical
  * types must come back casted to the types the suite was built against
  * (round-7 incident: events.ts ns-int64 → timestamp[us] silently errored
  * 23 queries).
  */
class TablesSpec extends SparkTestBase {

  test("drifted column types are cast back to the contract") {
    val dir = "/tmp/graft_tablesspec_drift"
    // documents with doc_id written int32 and n_chars double — both drifted
    spark.range(0, 10).select(
        col("id").cast("int").as("doc_id"),
        concat(lit("text "), col("id")).as("text"),
        lit("en").as("lang"), lit("web").as("source"),
        (col("id") + 5).cast("double").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType === LongType)
    assert(df.schema("n_chars").dataType === LongType)
    assert(df.count() === 10)
    assert(df.agg(sum("doc_id")).head().getLong(0) === 45L)
  }

  test("conforming fixtures pass through without a projection") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(df.schema("doc_id").dataType === LongType)
    // no drift → the plan is the bare relation, not relation + Project
    assert(df.queryExecution.analyzed.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }.isEmpty)
  }

  test("events: raw int64 MICROS ts is detected by magnitude and scaled to ns") {
    val dir = "/tmp/graft_tablesspec_events_us"
    // a plausible future regen: plain int64 epoch-micros (NOT the
    // nanosAsLong read of ns-precision parquet — same LongType, 1000x off)
    val base = 1700000000000000L // ~2023-11 in epoch-micros
    spark.range(0, 5).select(
        col("id").as("event_id"),
        (lit(base) + col("id") * 60000000L).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        col("id").cast("double").as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    val first = ev.orderBy("event_id").select("ts_ns").head().getLong(0)
    assert(first === base * 1000L) // scaled micros -> nanos
  }

  test("events: both fixture generations land on the ts_ns/ts contract") {
    val dir = "/tmp/graft_tablesspec_events"
    // new-generation fixture: timestamp[us] (NTZ)
    spark.range(0, 5).select(
        col("id").as("event_id"),
        timestamp_seconds(col("id") * 60).cast(TimestampNTZType).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        col("id").cast("double").as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts_ns").dataType === LongType)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.orderBy("event_id").select("ts_ns").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect()
    assert(r.toSeq === Seq(0L, 60000000000L, 120000000000L, 180000000000L, 240000000000L))
  }
}
