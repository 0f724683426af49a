package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `df.writeStream.toTable("graft.t")` — the streaming write half of the
  * snapshot protocol ([[StreamingSnapshotTable]]): epoch commits publish
  * manifests with `(queryId, epochId)` identity, replayed epochs are
  * no-ops, restarts keep the SAME stable query id, and a concurrent batch
  * writer's manifest race is reconciled (blind append), never lost.
  */
class StreamingTableWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("stream_tbl").toString

  private val srcSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("p", LongType)))

  private def rows(ids: Range): Seq[(Long, String, Long)] =
    ids.map(i => (i.toLong, s"v$i", i.toLong % 3))

  private def runToTable(src: String, cp: String, tbl: String,
      maxFilesPerTrigger: Int = 2): Unit = {
    val q = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(src)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .toTable(tbl)
    q.awaitTermination()
  }

  test("toTable appends through the snapshot protocol, multi-epoch, " +
      "restart processes only new files, query id is stable") {
    val root = freshRoot()
    val src = s"$root/_src"; val cp = s"$root/_cp"
    Snapshots.createTable(spark, root, "t", srcSchema, Seq("p"))
    GraftCatalog.install(spark, "graftsw", root)

    rows(0 until 40).toDF("id", "v", "p").repartition(4)
      .write.mode("append").parquet(src)
    runToTable(src, cp, "graftsw.t") // 4 files, 2 per trigger → 2 epochs

    val got = spark.sql("SELECT id, v, p FROM graftsw.t")
      .as[(Long, String, Long)].collect().toSet
    assert(got === rows(0 until 40).toSet)
    val hist = Snapshots.history(spark, root, "t")
      .select("version", "operation").as[(Long, String)].collect().toMap
    val streamVersions = hist.collect { case (v, "stream") => v }.toSeq
    assert(streamVersions.size === 2, s"expected 2 stream epochs in $hist")
    val epochs = streamVersions.map(v =>
      Snapshots.manifest(spark, root, "t", v).streamEpoch.get)
    assert(epochs.map(_._1).distinct.size === 1) // one query id
    assert(epochs.map(_._2).sorted === Seq(0L, 1L))

    // re-run with the same checkpoint and NO new files: nothing commits
    val before = Snapshots.latestVersion(spark, root, "t").get
    runToTable(src, cp, "graftsw.t")
    assert(Snapshots.latestVersion(spark, root, "t").get === before)

    // new files + restart: only they append, under the SAME stable query
    // id (the exactly-once ledger key — a per-run id would dedup nothing
    // across restarts)
    rows(40 until 50).toDF("id", "v", "p").coalesce(1)
      .write.mode("append").parquet(src)
    runToTable(src, cp, "graftsw.t")
    val after = spark.sql("SELECT id FROM graftsw.t").as[Long].collect()
    assert(after.length === 50 && after.toSet === (0L until 50L).toSet)
    val lastEpoch = Snapshots
      .manifest(spark, root, "t", before + 1).streamEpoch.get
    assert(lastEpoch._1 === epochs.head._1, "query id changed across restart")
    assert(lastEpoch._2 > epochs.map(_._2).max)

    // partition layout: streamed files landed in Hive directories the
    // catalog prunes like any batch-committed file
    val pruned = spark.sql("SELECT count(*) FROM graftsw.t WHERE p = 1")
      .as[Long].head()
    assert(pruned === (0 until 50).count(_ % 3 == 1))
  }

  test("a replayed epoch commits nothing (exactly-once ledger)") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, 10L)).toDF("id", "x"), root, "t", Seq.empty)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType)))
    def stageAndCommit(): Long = {
      val stage = s"$root/t/.streamstage-q1/7"
      Seq((2L, 20L)).toDF("id", "x").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val rel = new java.io.File(stage).listFiles()
        .map(_.getName).filter(n => n.endsWith(".parquet")).head
      val added = Snapshots.adoptStagedFiles(spark, root, "t", stage, Seq(rel))
      Snapshots.commitStreamEpoch(spark, root, "t", added, schema,
        Seq.empty, Seq.empty, queryId = "q1", epochId = 7L)
    }
    val v1 = stageAndCommit()
    assert(v1 === 2L)
    // replay: same (queryId, epochId) → the ledger short-circuits, no
    // version publishes, the re-staged file stays unreferenced
    val v2 = stageAndCommit()
    assert(v2 === v1)
    assert(Snapshots.latestVersion(spark, root, "t").get === v1)
    assert(Snapshots.readVersion(spark, root, "t", v1).count() === 2)
    // a DIFFERENT epoch of the same query still commits
    val stage3 = s"$root/t/.streamstage-q1/8"
    Seq((3L, 30L)).toDF("id", "x").coalesce(1)
      .write.mode("overwrite").parquet(stage3)
    val rel3 = new java.io.File(stage3).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    val added3 = Snapshots.adoptStagedFiles(spark, root, "t", stage3, Seq(rel3))
    assert(Snapshots.commitStreamEpoch(spark, root, "t", added3, schema,
      Seq.empty, Seq.empty, "q1", 8L) === v1 + 1)
  }

  test("the epoch ledger's high-water index is carried by every verb and " +
      "keeps the replay probe exact across batch commits, deletes, " +
      "compaction and RESTORE") {
    val root = freshRoot()
    Snapshots.commit((0L until 8L).map(i => (i, i)).toDF("id", "x"),
      root, "t", Seq.empty)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType)))
    def epoch(e: Long, id: Long): Long = {
      val stage = s"$root/t/.streamstage-qhw/$e"
      Seq((id, id)).toDF("id", "x").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val rel = new java.io.File(stage).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).head
      val added = Snapshots.adoptStagedFiles(spark, root, "t", stage, Seq(rel))
      Snapshots.commitStreamEpoch(spark, root, "t", added, schema,
        Seq.empty, Seq.empty, "qhw", e)
    }
    val v2 = epoch(0L, 100L)
    // interleave every manifest-writing verb: each must CARRY the index
    Snapshots.commit(Seq((200L, 200L)).toDF("id", "x"), root, "t", Seq.empty)
    Snapshots.deleteWhere(spark, root, "t", col("id") === 1L)
    Snapshots.evolveSchema(spark, root, "t", Seq(StructField("note",
      org.apache.spark.sql.types.StringType)))
    Snapshots.compact(spark, root, "t", Seq.empty, 1, Seq("id"))
    val latest = Snapshots.latestVersion(spark, root, "t").get
    assert(Snapshots.manifest(spark, root, "t", latest).epochs ===
      Map("qhw" -> 0L), "a verb dropped the epoch high-water index")
    // replay of epoch 0 after all of them: still found, nothing re-commits
    assert(Snapshots.epochVersion(spark, root, "t", "qhw", 0L) === Some(v2))
    assert(epoch(0L, 999L) === v2)
    assert(Snapshots.latestVersion(spark, root, "t").get === latest)
    // a NEW epoch answers from the latest manifest alone and commits
    assert(Snapshots.epochVersion(spark, root, "t", "qhw", 1L) === None)
    val v8 = epoch(1L, 101L)
    // RESTORE to before epoch 1: the ledger must stay MONOTONE (carried
    // from the latest manifest, not the restore target) — a replay of
    // epoch 1 after the rollback must not re-append
    Snapshots.restore(spark, root, "t", v8 - 1)
    assert(Snapshots.manifest(spark, root, "t",
      Snapshots.latestVersion(spark, root, "t").get).epochs ===
      Map("qhw" -> 1L))
    assert(epoch(1L, 998L) === v8)
  }

  test("a concurrent batch commit between epoch read and publish is " +
      "reconciled, not lost (retryable race, metadata-only retry)") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root, "t", Seq.empty)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val stage = s"$root/t/.streamstage-q2/0"
    Seq((2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val rel = new java.io.File(stage).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    val added = Snapshots.adoptStagedFiles(spark, root, "t", stage, Seq(rel))
    // competing append lands INSIDE the epoch's publish window, once
    @volatile var fired = false
    Snapshots.beforePublish = () => if (!fired) {
      fired = true
      Seq((99L, "z")).toDF("id", "v").createOrReplaceTempView("__race_src")
      // a plain batch append through the protocol (its own publish also
      // runs beforePublish — the flag keeps it single-shot)
      Snapshots.commit(spark.table("__race_src"), root, "t", Seq.empty)
    }
    try {
      val v = Snapshots.commitStreamEpoch(spark, root, "t", added, schema,
        Seq.empty, Seq.empty, "q2", 0L)
      assert(v === 3L) // v2 = the racing batch append, v3 = the epoch
    } finally Snapshots.beforePublish = () => ()
    val all = Snapshots.readVersion(spark, root, "t", 3L)
      .select("id").as[Long].collect().toSet
    assert(all === Set(1L, 2L, 99L))
    assert(Snapshots.manifest(spark, root, "t", 3L)
      .streamEpoch.contains(("q2", 0L)))
  }

  test("an INT partition column commits UNWIDENED: the stream resolves " +
      "the catalog's BIGINT-widened read schema, but the epoch must not " +
      "evolve the stored manifest type — later int-typed batch appends " +
      "keep working") {
    val root = freshRoot()
    val intSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("p", org.apache.spark.sql.types.IntegerType)))
    Snapshots.createTable(spark, root, "ti", intSchema, Seq("p"))
    GraftCatalog.install(spark, "graftsw3", root)
    val src = s"$root/_src"
    // the stream reads the table's WIDENED schema (p: bigint) — exactly
    // the shape toTable resolves for its own write validation
    Seq((1L, 0L), (2L, 1L)).toDF("id", "p")
      .write.mode("append").parquet(src)
    val q = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("p", LongType))))
      .parquet(src)
      .writeStream.option("checkpointLocation", s"$root/_cp")
      .trigger(Trigger.AvailableNow()).toTable("graftsw3.ti")
    q.awaitTermination()
    val latest = Snapshots.latestVersion(spark, root, "ti").get
    val committed = Snapshots.manifest(spark, root, "ti", latest).schema.get
    assert(committed("p").dataType ===
      org.apache.spark.sql.types.IntegerType,
      s"stream epoch widened the stored partition type: $committed")
    // the additive check type-matches against the manifest — an int-typed
    // batch frame must still append (a widened manifest would refuse the
    // long -> int narrowing here)
    Snapshots.append(Seq((3L, 2)).toDF("id", "p"), root, "ti", Seq("p"))
    assert(spark.sql("SELECT id FROM graftsw3.ti")
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("a NULL partition value refuses task-side, loudly — the documented " +
      "batch/stream divergence (batch writes __HIVE_DEFAULT_PARTITION__; " +
      "a null partition in a CDC stream is a bug upstream)") {
    val root = freshRoot()
    Snapshots.createTable(spark, root, "tn", srcSchema, Seq("p"))
    GraftCatalog.install(spark, "graftsw4", root)
    val src = s"$root/_src"
    Seq((1L, "a", Some(0L)), (2L, "b", None))
      .toDF("id", "v", "p").write.mode("append").parquet(src)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.schema(srcSchema).parquet(src)
        .writeStream.option("checkpointLocation", s"$root/_cp")
        .trigger(Trigger.AvailableNow()).toTable("graftsw4.tn")
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage)
      .exists(_.contains("null value in partition column"))), e.toString)
    // nothing committed: the failed epoch published no manifest
    assert(Snapshots.latestVersion(spark, root, "tn").get === 1L)
  }

  test("streaming write refuses unsupported partition column types and " +
      "missing partition columns loudly") {
    val root = freshRoot()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts",
        org.apache.spark.sql.types.TimestampType), StructField("p", LongType)))
    Snapshots.createTable(spark, root, "tt", schema, Seq("ts"))
    GraftCatalog.install(spark, "graftsw2", root)
    val src = s"$root/_src"
    Seq((1L, new java.sql.Timestamp(0L), 0L)).toDF("id", "ts", "p")
      .write.mode("append").parquet(src)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.option("checkpointLocation", s"$root/_cp")
        .trigger(Trigger.AvailableNow()).toTable("graftsw2.tt")
      q.awaitTermination()
    }
    assert(e.getMessage.contains("no stable Hive-directory encoding") ||
      Option(e.getCause).exists(_.getMessage
        .contains("no stable Hive-directory encoding")))
  }
}
