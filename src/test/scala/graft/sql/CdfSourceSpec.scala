package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Change-data-feed streaming source over Snapshots-versioned tables
  * ([[CdfSource]]): version-offset micro-batches, file-add inserts,
  * vector-key deletes, AvailableNow + exact checkpointed resume, and the
  * replaced-files refusal/skip contract.
  */
class CdfSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("cdf_src").toString

  private def runStream(root: String, table: String, out: String, cp: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format(classOf[CdfSource].getName)
      .option("root", root).option("table", table)
    val q = extra.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("adds stream as inserts, vectors as key deletes; resume is exact") {
    val root = freshRoot()
    val out = s"$root/_out"; val cp = s"$root/_cp"
    // unpartitioned commits APPEND (no partitions to replace)
    Snapshots.commit((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v"),
      root, "t", Seq.empty)
    Snapshots.commit((10L until 15L).map(i => (i, s"b$i")).toDF("id", "v"),
      root, "t", Seq.empty)
    Snapshots.deleteWhere(spark, root, "t", col("id").isin(2L, 3L))
    Snapshots.commit(Seq((15L, "c15")).toDF("id", "v"), root, "t", Seq.empty)

    runStream(root, "t", out, cp)
    val changes = spark.read.parquet(out)
    assert(changes.columns.toSet ===
      Set("id", "v", "_change_type", "_commit_version"))
    val byBatch = changes
      .groupBy("_commit_version", "_change_type").count()
      .as[(Long, String, Long)].collect()
      .map { case (cv, ct, n) => (cv, ct) -> n }.toMap
    assert(byBatch === Map((1L, "insert") -> 10L, (2L, "insert") -> 5L,
      (3L, "delete") -> 2L, (4L, "insert") -> 1L))
    // delete rows carry the vector key columns; the rest is null
    val dels = changes.filter($"_change_type" === "delete")
      .select("id", "v").as[(Long, Option[String])].collect().toSet
    assert(dels === Set((2L, None), (3L, None)))
    // applying the stream's changes replays the final table exactly
    val replayed = changes.filter($"_change_type" === "insert")
      .join(changes.filter($"_change_type" === "delete").select("id"),
        Seq("id"), "left_anti")
      .select("id", "v").as[(Long, String)].collect().toSet
    val direct = Snapshots.readVersion(spark, root, "t", 4L)
      .as[(Long, String)].collect().toSet
    assert(replayed === direct)

    // resume: one more version; the checkpointed stream consumes ONLY it
    Snapshots.commit(Seq((16L, "d16")).toDF("id", "v"), root, "t", Seq.empty)
    runStream(root, "t", out, cp)
    val after = spark.read.parquet(out)
    assert(after.count() === changes.count() + 1)
    assert(after.filter($"_commit_version" === 5L)
      .select("id").as[Long].collect().toSeq === Seq(16L))
  }

  test("a version that removes files refuses; skipChangeCommits skips it") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p"),
      root, "t", Seq("p"))
    // dynamic overwrite of p=0: removes that partition's file — file adds
    // cannot attribute the change
    Snapshots.commit(Seq((1L, "a2", 0)).toDF("id", "v", "p"),
      root, "t", Seq("p"))
    Snapshots.commit(Seq((3L, "c", 2)).toDF("id", "v", "p"),
      root, "t", Seq("p"))
    val e = intercept[Exception] {
      runStream(root, "t", s"$root/_out1", s"$root/_cp1")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null)
      && chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("removed"))), e.toString)

    runStream(root, "t", s"$root/_out2", s"$root/_cp2",
      Map("skipChangeCommits" -> "true"))
    val changes = spark.read.parquet(s"$root/_out2")
    val byBatch = changes.groupBy("_commit_version").count()
      .as[(Long, Long)].collect().toMap
    // v1 and v3 stream; the replacing v2 is skipped entirely
    assert(byBatch === Map(1L -> 2L, 3L -> 1L))
  }

  test("a metadata-only evolve version streams zero changes (same files, " +
      "no vectors) — the CDF contract survives ALTER TABLE ADD COLUMNS") {
    val root = freshRoot()
    Snapshots.commit((0L until 5L).map(i => (i, s"a$i")).toDF("id", "v"),
      root, "t", Seq.empty)
    Snapshots.evolveSchema(spark, root, "t",
      Seq(org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType))) // v2: same files, new schema
    Snapshots.commit(Seq((9L, "b9", "n9")).toDF("id", "v", "note"),
      root, "t", Seq.empty) // v3: an append under the evolved schema
    runStream(root, "t", s"$root/_out", s"$root/_cp")
    val changes = spark.read.parquet(s"$root/_out")
    val byBatch = changes.groupBy("_commit_version").count()
      .as[(Long, Long)].collect().toMap
    // v1's 5 inserts and v3's 1 insert stream; the evolve version adds no
    // files and removes none — zero rows, never a refusal
    assert(byBatch === Map(1L -> 5L, 3L -> 1L), byBatch)
  }

  test("maxVersionsPerBatch paces catch-up into several micro-batches") {
    val root = freshRoot()
    (1 to 4).foreach(i =>
      Snapshots.commit(Seq((i.toLong, s"v$i")).toDF("id", "v"),
        root, "t", Seq.empty))
    runStream(root, "t", s"$root/_out", s"$root/_cp",
      Map("maxVersionsPerBatch" -> "1"))
    // same rows either way…
    assert(spark.read.parquet(s"$root/_out").count() === 4)
    // …but consumed as FOUR micro-batches: one committed offset each
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val offsets = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_cp/offsets")).toSeq
      .map(_.getPath.getName).filterNot(_.startsWith("."))
    assert(offsets.size === 4, offsets.toString)
  }

  test("column pruning pushes into the per-version scans and delete rows") {
    val root = freshRoot()
    Snapshots.commit((0L until 6L).map(i => (i, s"w$i", i * 10.0))
      .toDF("id", "wide", "x"), root, "t", Seq.empty)
    Snapshots.deleteWhere(spark, root, "t", col("id") === 4L)
    val q = spark.readStream.format(classOf[CdfSource].getName)
      .option("root", root).option("table", "t").load()
      .select("id", "_commit_version") // prunes `wide`, `x`, `_change_type`
      .writeStream.format("parquet")
      .option("path", s"$root/_out").option("checkpointLocation", s"$root/_cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$root/_out")
    assert(out.columns.toSeq === Seq("id", "_commit_version"))
    val rows = out.as[(Long, Long)].collect().toSet
    assert(rows === (0L until 6L).map((_, 1L)).toSet + ((4L, 2L)),
      "six pruned inserts plus the pruned delete row")
  }

  test("startingVersion skips earlier history") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root, "t", Seq.empty)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "v"), root, "t", Seq.empty)
    Snapshots.commit(Seq((3L, "c")).toDF("id", "v"), root, "t", Seq.empty)
    runStream(root, "t", s"$root/_out", s"$root/_cp",
      Map("startingVersion" -> "3"))
    val ids = spark.read.parquet(s"$root/_out")
      .select("id").as[Long].collect().toSeq
    assert(ids === Seq(3L))
  }

  test("batch <table>.changes: inclusive window, conf baked at load, " +
      "pruning, refusal + skipChangeCommits — same planner as the stream") {
    val root = freshRoot()
    Snapshots.commit((0L until 10L).map(i => (i, s"a$i")).toDF("id", "v"),
      root, "t", Seq.empty)
    Snapshots.commit((10L until 15L).map(i => (i, s"b$i")).toDF("id", "v"),
      root, "t", Seq.empty)
    Snapshots.deleteWhere(spark, root, "t", col("id").isin(2L, 3L))
    GraftCatalog.install(spark, "graftchg", root)

    def window(start: Long, end: Long): org.apache.spark.sql.DataFrame = {
      spark.conf.set("spark.graft.changes.startVersion", start.toString)
      spark.conf.set("spark.graft.changes.endVersion", end.toString)
      try spark.sql("SELECT id, _change_type, _commit_version " +
        "FROM graftchg.t.changes")
      finally {
        spark.conf.unset("spark.graft.changes.startVersion")
        spark.conf.unset("spark.graft.changes.endVersion")
      }
    }
    // full window: 15 inserts + 2 key-level deletes
    val all = window(1, 3)
    assert(all.count() === 17)
    // the window is INCLUSIVE on both ends and baked at load time — the
    // confs were already unset when this executes
    val mid = window(2, 2).as[(Long, String, Long)].collect().toSet
    assert(mid === (10L until 15L).map((_, "insert", 2L)).toSet)
    val dels = window(3, 3).as[(Long, String, Long)].collect().toSet
    assert(dels === Set((2L, "delete", 3L), (3L, "delete", 3L)))
    // replays the table exactly
    val replayed = all.where("_change_type = 'insert'")
      .join(all.where("_change_type = 'delete'").select("id"),
        Seq("id"), "left_anti").select("id").as[Long].collect().toSet
    assert(replayed === Snapshots.readVersion(spark, root, "t", 3L)
      .select("id").as[Long].collect().toSet)

    // TIMESTAMP-windowed spelling: resolves through the manifests'
    // portable commit times exactly like TIMESTAMP AS OF — start = first
    // version AT/AFTER the instant, end = last at/before; version confs
    // win when both are set
    val times = (1L to 3L)
      .map(v => v -> Snapshots.manifest(spark, root, "t", v).committedAtMillis.get)
    val t2 = times.find(_._1 == 2L).get._2
    // commits can land within one millisecond — derive the instant's
    // exact version window from the manifest times themselves
    val expStart = times.collectFirst { case (v, ts) if ts >= t2 => v }.get
    val expEnd = times.reverse.collectFirst { case (v, ts) if ts <= t2 => v }.get
    spark.conf.set("spark.graft.changes.startTimestampMillis", t2.toString)
    spark.conf.set("spark.graft.changes.endTimestampMillis", t2.toString)
    try {
      val byTs = spark.sql("SELECT id, _change_type, _commit_version " +
        "FROM graftchg.t.changes").as[(Long, String, Long)].collect().toSet
      spark.conf.unset("spark.graft.changes.startTimestampMillis")
      spark.conf.unset("spark.graft.changes.endTimestampMillis")
      assert(byTs ===
        window(expStart, expEnd).as[(Long, String, Long)].collect().toSet,
        s"window [$expStart,$expEnd] at ts=$t2: $byTs")
      // an end instant predating v1 is an EMPTY window, not an error
      spark.conf.set("spark.graft.changes.endTimestampMillis", "1")
      spark.conf.unset("spark.graft.changes.startTimestampMillis")
      assert(spark.sql("SELECT * FROM graftchg.t.changes").count() === 0L)
    } finally {
      spark.conf.unset("spark.graft.changes.startTimestampMillis")
      spark.conf.unset("spark.graft.changes.endTimestampMillis")
    }

    // a replace-shaped version refuses; skipChangeCommits skips it
    Snapshots.compact(spark, root, "t", Seq.empty, 1, Seq("id"))
    val e = intercept[Exception] { window(1, 4).collect() }
    assert(e.getMessage != null && e.getMessage.contains("removed") ||
      Option(e.getCause).exists(_.getMessage.contains("removed")), e.toString)
    spark.conf.set("spark.graft.changes.skipChangeCommits", "true")
    try assert(window(1, 4).count() === 17) // v4 skipped, nothing phantom
    finally spark.conf.unset("spark.graft.changes.skipChangeCommits")
  }
}
