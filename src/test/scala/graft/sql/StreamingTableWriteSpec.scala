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
