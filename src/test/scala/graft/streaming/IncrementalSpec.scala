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

  test("checkpointed AvailableNow resumes incrementally: second run reads ONLY new files (I1/I6)") {
    val base = java.nio.file.Files.createTempDirectory("graft_incr_ckpt").toString
    val (srcDir, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    def addFile(rows: Seq[(Long, String, Long, String, Double)], name: String): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(srcDir)
    addFile(Seq((1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 11:00:00", 2L, "b", 2.0)), "f1")
    // run 1: processes the 2 existing rows
    Incremental.runIncrementalToParquet(
      Incremental.fileStream(spark, srcDir, schema).select($"event_id", $"user_id"),
      sink, ckpt)
    assert(spark.read.parquet(sink).count() === 2)
    // a new file lands; run 2 RESUMES from the checkpoint — only the new row
    // is processed (appended), nothing reprocessed
    addFile(Seq((3L, "2024-01-02 09:00:00", 3L, "c", 3.0)), "f2")
    Incremental.runIncrementalToParquet(
      Incremental.fileStream(spark, srcDir, schema).select($"event_id", $"user_id"),
      sink, ckpt)
    val ids = spark.read.parquet(sink).select($"event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L)) // exactly once each — no duplicates
    // run 3 with nothing new appends nothing (idempotent daily trigger)
    Incremental.runIncrementalToParquet(
      Incremental.fileStream(spark, srcDir, schema).select($"event_id", $"user_id"),
      sink, ckpt)
    assert(spark.read.parquet(sink).count() === 3)
  }

  test("sessionize closes sessions at the gap and carries exact sums (custom state)") {
    val d = java.nio.file.Files.createTempDirectory("graft_sess").toString
    Seq(
      // user 1: two sessions split by a 3h gap; user 2: one session
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.10),
      (2L, "2024-01-01 10:30:00", 1L, "a", 2.20),
      (3L, "2024-01-01 14:00:00", 1L, "a", 4.40),
      (4L, "2024-01-01 09:00:00", 2L, "a", 7.70),
      // sentinel far in the future closes the last open sessions in-batch
      (98L, "2024-02-01 00:00:00", 1L, "s", 0.0),
      (99L, "2024-02-01 00:00:00", 2L, "s", 0.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(d)
    val sessions = Incremental.sessionize(
      Incremental.fileStream(spark, d, schema), "ts", "user_id", "value",
      gapUs = 2L * 3600 * 1000000)
    Incremental.runAvailableNow(sessions, "sess_out")
    val got = spark.table("sess_out")
      .select($"user_id", $"n_events", $"value_sum")
      .as[(Long, Long, Double)].collect().toSet
    // sentinel sessions stay open in state and are never emitted
    assert(got === Set((1L, 2L, 3.30), (1L, 1L, 4.40), (2L, 1L, 7.70)))
  }

  test("sessionize extends a session BACKWARDS for a late in-gap event (out-of-order across batches)") {
    // file 1 (batch 1) opens a session at 10:00; file 2 (batch 2) delivers
    // an out-of-order event at 09:00 — earlier than the open session's
    // start, within gap of its end. flatMapGroupsWithState does not drop
    // late rows, so the session must extend backwards to 09:00. A sentinel
    // then closes it. maxFilesPerTrigger=1 forces one file per micro-batch
    // inside a single AvailableNow run, so state genuinely crosses batches.
    val d = java.nio.file.Files.createTempDirectory("graft_sess3").toString
    def write(rows: Seq[(Long, String, Long, String, Double)], name: String): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$name")
    // staged as separate dirs then moved in lexical order for deterministic
    // file-discovery order (source sorts by path for equal timestamps)
    write(Seq((1L, "2024-01-01 10:00:00", 1L, "a", 1.0)), "stage_a")
    write(Seq((2L, "2024-01-01 09:00:00", 1L, "a", 2.0)), "stage_b")
    write(Seq((9L, "2024-03-01 00:00:00", 1L, "s", 0.0)), "stage_c")
    val fs = java.nio.file.FileSystems.getDefault
    Seq("a", "b", "c").foreach { s =>
      val src = java.nio.file.Files.list(fs.getPath(d, s"stage_$s"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(src, fs.getPath(d, s"part_$s.parquet"))
      Thread.sleep(1100) // distinct mtimes → stable discovery order
    }
    val sessions = Incremental.sessionize(
      Incremental.fileStream(spark, d, schema, maxFilesPerTrigger = Some(1)),
      "ts", "user_id", "value", gapUs = 2L * 3600 * 1000000)
    Incremental.runAvailableNow(sessions, "sess3_out")
    val got = spark.table("sess3_out")
      .select($"user_id", date_format($"session_start", "HH:mm").as("st"),
        $"n_events", $"value_sum")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got === Set((1L, "09:00", 2L, 3.0)))
  }

  test("sessionize emits a far-early late event as its own closed session (no false merge)") {
    // batch 1 opens a session at 10:00 (gap 2h); batch 2 delivers an event
    // at 06:00 — more than a gap BEFORE the open session's start. Batch
    // gaps-and-islands puts a break between them: expect TWO sessions, not
    // one 06:00-10:00 merge.
    val d = java.nio.file.Files.createTempDirectory("graft_sess4").toString
    def write(rows: Seq[(Long, String, Long, String, Double)], name: String): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$name")
    write(Seq((1L, "2024-01-01 10:00:00", 1L, "a", 1.0)), "stage_a")
    write(Seq((2L, "2024-01-01 06:00:00", 1L, "a", 2.0)), "stage_b")
    write(Seq((9L, "2024-03-01 00:00:00", 1L, "s", 0.0)), "stage_c")
    val fs = java.nio.file.FileSystems.getDefault
    Seq("a", "b", "c").foreach { s =>
      val src = java.nio.file.Files.list(fs.getPath(d, s"stage_$s"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(src, fs.getPath(d, s"part_$s.parquet"))
      Thread.sleep(1100)
    }
    val sessions = Incremental.sessionize(
      Incremental.fileStream(spark, d, schema, maxFilesPerTrigger = Some(1)),
      "ts", "user_id", "value", gapUs = 2L * 3600 * 1000000)
    Incremental.runAvailableNow(sessions, "sess4_out")
    val got = spark.table("sess4_out")
      .select($"user_id", date_format($"session_start", "HH:mm").as("st"),
        $"n_events", $"value_sum")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got === Set((1L, "06:00", 1L, 2.0), (1L, "10:00", 1L, 1.0)))
  }

  test("sessionize merges an open session with events arriving in a later batch") {
    val d = java.nio.file.Files.createTempDirectory("graft_sess2").toString
    def write(rows: Seq[(Long, String, Long, String, Double)], mode: String): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
        .write.mode(mode).parquet(d)
    write(Seq((1L, "2024-01-01 10:00:00", 1L, "a", 1.0)), "overwrite")
    val q1 = Incremental.sessionize(
      Incremental.fileStream(spark, d, schema), "ts", "user_id", "value",
      gapUs = 2L * 3600 * 1000000)
    Incremental.runAvailableNow(q1, "sess2_a")
    assert(spark.table("sess2_a").count() === 0) // still open
    // second run (fresh checkpoint → replays all): an in-gap event extends,
    // a sentinel closes
    write(Seq(
      (2L, "2024-01-01 11:00:00", 1L, "a", 2.0),
      (9L, "2024-03-01 00:00:00", 1L, "s", 0.0)), "append")
    val q2 = Incremental.sessionize(
      Incremental.fileStream(spark, d, schema), "ts", "user_id", "value",
      gapUs = 2L * 3600 * 1000000)
    Incremental.runAvailableNow(q2, "sess2_b")
    val got = spark.table("sess2_b")
      .select($"user_id", $"n_events", $"value_sum")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 3.0)))
  }

  test("runForeachBatchToParquet: fn applied per batch, sink is the union; " +
      "checkpointed re-run processes only new files") {
    import org.apache.spark.sql.types._
    val d = "/tmp/graft_inc_feb_src"
    val sink = "/tmp/graft_inc_feb_sink"
    val ckpt = "/tmp/graft_inc_feb_ckpt"
    Seq(d, sink, ckpt).foreach(p =>
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true))
    val schema = StructType(Seq(StructField("id", LongType)))
    def stream = Incremental.fileStream(spark, d, schema)
    Seq(1L, 2L).toDF("id").write.mode("overwrite").parquet(d)
    Incremental.runForeachBatchToParquet(stream, sink, ckpt,
      (b, _) => b.withColumn("doubled", $"id" * 2))
    assert(spark.read.parquet(sink).as[(Long, Long)].collect().toSet ===
      Set((1L, 2L), (2L, 4L)))
    // second run with the SAME checkpoint: only the new file is processed
    Seq(3L).toDF("id").write.mode("append").parquet(d)
    Incremental.runForeachBatchToParquet(stream, sink, ckpt,
      (b, _) => b.withColumn("doubled", $"id" * 2))
    assert(spark.read.parquet(sink).count() === 3,
      "re-run must append only the new file's rows (no reprocessing)")
  }

  test("streaming CDC state on Snapshots: checkpointed resume + replay idempotence") {
    import graft.lake.Snapshots
    import graft.operators.Cdc
    val src = "/tmp/graft_inc_cdc_src"
    val root = "/tmp/graft_inc_cdc_state"
    val ckpt = "/tmp/graft_inc_cdc_ckpt"
    Seq(src, root, ckpt).foreach(p =>
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true))
    val opsSchema = StructType(Seq(
      StructField("k", LongType), StructField("seq", LongType),
      StructField("op", StringType), StructField("cents", LongType)))
    def opsDf(rows: Seq[(Long, Long, String, Long)]) =
      rows.toDF("k", "seq", "op", "cents")
    // seed state as snapshot v1 — streaming and batch share ONE protocol
    Snapshots.replace(
      Cdc.seedState(Seq((1L, 0L), (2L, 0L)).toDF("k", "cents"),
        opsDf(Nil), Seq("seq")),
      root, "state")
    def applyBatch(batch: org.apache.spark.sql.DataFrame): Unit = {
      val latest = Snapshots.latestVersion(spark, root, "state").get
      Snapshots.replaceRetry(
        Cdc.mergeStateful(Snapshots.readVersion(spark, root, "state", latest),
          batch, Seq("k"), Seq("seq"), "op", "D",
          Map("cents" -> col("cents"))),
        root, "state")
    }
    def run(): Unit = {
      val q = Incremental.fileStream(spark, src, opsSchema,
          maxFilesPerTrigger = Some(1))
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => applyBatch(b))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    opsDf(Seq((1L, 10L, "U", 100L), (3L, 5L, "U", 30L)))
      .coalesce(1).write.mode("append").parquet(src)
    run()
    // RESUME: new ops arrive, same checkpoint — only the new file applies
    opsDf(Seq((2L, 7L, "D", 0L), (1L, 4L, "U", 999L))) // late LOWER seq for k=1
      .coalesce(1).write.mode("append").parquet(src)
    run()
    def current = Cdc.currentView(Snapshots.readVersion(spark, root, "state",
      Snapshots.latestVersion(spark, root, "state").get))
      .select("k", "cents").as[(Long, Long)].collect().toSet
    val expected = Set((1L, 100L), (3L, 30L)) // k=2 deleted; late 999 loses
    assert(current === expected)
    // REPLAY idempotence (the foreachBatch retry contract): re-applying an
    // already-applied batch against the LATEST state is a no-op — the
    // seq guard makes batch-id state addressing unnecessary
    val before = Snapshots.latestVersion(spark, root, "state").get
    applyBatch(opsDf(Seq((2L, 7L, "D", 0L), (1L, 4L, "U", 999L))))
    assert(current === expected, "replay must not change the state")
    // and the state table has full time travel: the seed is still readable
    assert(Snapshots.readVersion(spark, root, "state", 1L).count() === 2L)
    assert(Snapshots.latestVersion(spark, root, "state").get === before + 1)
  }
}
