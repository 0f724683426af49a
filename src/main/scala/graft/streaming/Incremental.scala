package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

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
  /** Typed rows for [[sessionize]]'s custom state machine. */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, cents: Long)
  case class SessionState(start: Long, end: Long, n: Long, cents: Long)
  case class SessionRow(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, cents: Long)

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L)

  /** Session building over an event stream with CUSTOM state
    * (`flatMapGroupsWithState` + event-time timeout): a session is a maximal
    * per-user run of events with consecutive gaps ≤ `gapUs` microseconds.
    * Within a batch the user's events fold through the open-session
    * accumulator (closing sessions as gaps appear); the still-open session
    * is carried as group state with an event-time timeout at
    * `end + gap`, so the watermark — not wall-clock — closes idle sessions.
    * Emits one row per CLOSED session (append semantics).
    *
    * Scale: state per user is one fixed-size accumulator (no event buffer),
    * the stateful shuffle is by user key, and timeouts evict idle users, so
    * state size tracks ACTIVE users only.
    *
    * Exact sums: event values fold as integer cents ([[graft.functions.ExactAgg]]
    * rationale) — emission order can't perturb the totals.
    */
  def sessionize(stream: DataFrame, tsCol: String, userCol: String,
      valueCol: String, gapUs: Long): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapMs = gapUs / 1000L

    def fn(user: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionRow] = {
      def close(a: SessionState) = SessionRow(user, a.start, a.end, a.n, a.cents)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).iterator.toSeq
        state.remove()
        out.iterator
      } else {
        val evs = it.toArray.sortBy(e => micros(e.ts))
        val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
        var acc = state.getOption
        evs.foreach { e =>
          val t = micros(e.ts)
          acc = acc match {
            case Some(a) if t - a.end > gapUs =>
              closed += close(a); Some(SessionState(t, t, 1, e.cents))
            case Some(a) if a.start - t > gapUs =>
              // out-of-order event from a later micro-batch that precedes
              // the open session's start by MORE than the gap: it cannot
              // belong to this session (batch gaps-and-islands would put a
              // break between them), and its own session closed in the
              // past — emit it as a closed singleton, keep the open session
              // untouched. (Events late enough to split an earlier session
              // further are approximated this way; a watermark would have
              // dropped them entirely.)
              closed += SessionRow(user, t, t, 1, e.cents); Some(a)
            case Some(a) =>
              // min on start too: flatMapGroupsWithState does NOT drop late
              // rows, so an out-of-order event from a later micro-batch with
              // t < a.start (but within gap of a.end) must extend the
              // session backwards, not silently inherit the old start.
              Some(SessionState(math.min(a.start, t), math.max(a.end, t),
                a.n + 1, a.cents + e.cents))
            case None => Some(SessionState(t, t, 1, e.cents))
          }
        }
        acc.foreach { a =>
          state.update(a)
          state.setTimeoutTimestamp(math.floorDiv(a.end, 1000L) + gapMs + 1)
        }
        closed.iterator
      }
    }

    stream
      .withWatermark(tsCol, "0 seconds")
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).as("ts"),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .select(col("user_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("n_events"),
        (col("cents") / 100.0).as("value_sum"))
  }

  def runAvailableNow(out: DataFrame, queryName: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = out.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Durable incremental run — the reference's ACTUAL daily-update shape
    * (I1/I6): a persistent checkpoint makes each AvailableNow invocation
    * process ONLY files that arrived since the last run, appending results
    * to a parquet sink. Re-running after a crash or restart resumes from the
    * checkpoint's offsets; no tracker sets, no reprocessing.
    */
  def runIncrementalToParquet(out: DataFrame, sinkPath: String,
      checkpointPath: String): StreamingQuery = {
    val q = out.writeStream
      .format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** foreachBatch runner (AvailableNow): every micro-batch is transformed
    * by `fn` (an arbitrary batch-DataFrame computation — index probes,
    * enrichment joins, MERGE-style writes) and appended to a parquet
    * sink. This is the streaming shape of the index-probe operators: the
    * stored index is read per batch, the stream side only ever carries
    * the new files. With a persistent checkpoint each invocation
    * processes only files that arrived since the last run.
    */
  def runForeachBatchToParquet(stream: DataFrame, sinkPath: String,
      checkpointPath: String,
      fn: (DataFrame, Long) => DataFrame): StreamingQuery = {
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        fn(batch.toDF(), id).write.mode("append").parquet(sinkPath)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** UPDATE-MODE streaming into a Snapshots-versioned table — the paved
    * path for "stream an aggregation into the lake": each micro-batch's
    * updated rows MERGE into `tableIdent` (matched keys update, new keys
    * insert), exactly the spelling docs/API.md recommends for
    * update/complete sinks, packaged so a windowed aggregation lands
    * with one call. Runs AvailableNow under a persistent checkpoint: a
    * restart processes only new source data, and a REPLAYED batch
    * re-merges the same content — idempotent by construction (same end
    * state), the effectively-once contract of foreachBatch upserts.
    *
    * `tableIdent` must name a Snapshots-versioned catalog table on a
    * session with the graft extensions (the SQL MERGE path); `keys` are
    * the upsert identity — every other column is SET from the batch.
    * Batches are defensively deduplicated on `keys` (last write wins is
    * NOT assumed — ANSI MERGE refuses duplicate source keys loudly).
    */
  def upsertToTable(stream: DataFrame, tableIdent: String,
      keys: Seq[String], checkpointPath: String): StreamingQuery = {
    require(keys.nonEmpty, "upsertToTable: key columns required")
    def q(c: String) = s"`$c`"
    val q0 = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns.toSeq
        require(keys.forall(cols.contains),
          s"upsertToTable: key(s) ${keys.filterNot(cols.contains).mkString(", ")} " +
            "absent from the stream")
        val view = s"__graft_upsert_${java.util.UUID.randomUUID().toString.take(8)}"
        batch.dropDuplicates(keys).createOrReplaceTempView(view)
        try {
          val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
          val sets = cols.filterNot(keys.contains)
            .map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
          val names = cols.map(q).mkString(", ")
          val vals = cols.map(c => s"s.${q(c)}").mkString(", ")
          val matched =
            if (sets.isEmpty) "" else s"WHEN MATCHED THEN UPDATE SET $sets"
          spark.sql(
            s"""MERGE INTO $tableIdent AS t USING $view AS s ON $on
                $matched
                WHEN NOT MATCHED THEN INSERT ($names) VALUES ($vals)""")
        } finally spark.catalog.dropTempView(view)
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q0.awaitTermination()
    q0
  }

  /** [[runAvailableNow]] with a scoped state-store width.
    *
    * `statePartitions` = number of state-store partitions for the query's
    * stateful operators (fixed at first start from the session's shuffle
    * partitions, then pinned in the checkpoint). Stateful shuffles carry
    * per-partition state-store commit overhead every micro-batch, so the
    * right width tracks STATE size, not data size — typically far fewer
    * than the batch shuffle width.
    *
    * The narrowed `spark.sql.shuffle.partitions` must not leak into batch
    * queries planned concurrently on the caller's session, so the stream is
    * BUILT AND RUN on a child session (`newSession()` — isolated SQLConf,
    * shared SparkContext/cache): `build` receives the child, and the
    * returned result table is the child's memory-sink temp view.
    */
  def runAvailableNowScoped(parent: SparkSession,
      build: SparkSession => DataFrame, queryName: String,
      outputMode: String, statePartitions: Int): DataFrame = {
    val child = parent.newSession()
    child.conf.set("spark.sql.shuffle.partitions", statePartitions)
    runAvailableNow(build(child), queryName, outputMode)
    child.table(queryName)
  }
}
