package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental/streaming semantics (SURVEY §2.10) restated with Structured
  * Streaming. The reference is a daily micro-batch system (I1-I7) — here the
  * same behaviors run as streaming queries:
  *
  *  - I3 idempotent refresh → `Trigger.AvailableNow` micro-batch over new
  *    files, writing with partition overwrite downstream;
  *  - I4 late-data dedup-append → watermark + `dropDuplicates` on the
  *    accession-like key (the reference's anti-join on accession_number,
  *    update/app.py:877-940);
  *  - event-time windowed aggregation with a watermark — the streaming
  *    analogue of the daily per-partition aggregates.
  */
object Incremental {

  /** File-driven micro-batch source over a directory of parquet (the
    * streaming analogue of the reference's daily cron pull).
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** I4 — exactly-once append of unseen keys: watermarked dedup on `keyCol`
    * ALONE (a re-delivery of the same accession with a different timestamp
    * is still a duplicate — the reference anti-joins on accession_number
    * only, update/app.py:877-940). `dropDuplicatesWithinWatermark` keys the
    * state by `keyCol` and still evicts it once the watermark passes, which
    * is the scale knob the reference's in-memory `seen` set lacks.
    */
  def dedupAppend(stream: DataFrame, tsCol: String, keyCol: String,
      watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Event-time windowed aggregation; set `watermark = None` when the input
    * stream already carries one (a watermark may only be defined once per
    * query even with chained stateful operators).
    */
  def windowedCounts(stream: DataFrame, tsCol: String, window: String,
      watermark: Option[String], groupCols: Seq[String]): DataFrame = {
    val groupExprs: Seq[org.apache.spark.sql.Column] =
      org.apache.spark.sql.functions.window(col(tsCol), window) +: groupCols.map(col)
    val outCols: Seq[org.apache.spark.sql.Column] =
      Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
        groupCols.map(col) ++
        Seq(col("n"), (col("value_cents") / 100.0).as("value_sum"))
    watermark.fold(stream)(w => stream.withWatermark(tsCol, w))
      .groupBy(groupExprs: _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(outCols: _*)
  }

  /** Run a streaming DataFrame to completion over currently-available data
    * (Trigger.AvailableNow — the reference's "process everything since the
    * last daily run" semantics) into an in-memory table; returns the query.
    */
  /** @param statePartitions number of state-store partitions for the query's
    *   stateful operators (fixed at first start from the session's shuffle
    *   partitions, then pinned in the checkpoint). Stateful shuffles carry
    *   per-partition state-store commit overhead every micro-batch, so the
    *   right width tracks STATE size, not data size — typically far fewer
    *   than the batch shuffle width.
    */
  def runAvailableNow(out: DataFrame, queryName: String,
      outputMode: String = "append",
      statePartitions: Option[Int] = None): StreamingQuery = {
    val spark = out.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    try {
      val q = out.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    } finally {
      statePartitions.foreach(_ => spark.conf.set("spark.sql.shuffle.partitions", prev))
    }
  }
}
