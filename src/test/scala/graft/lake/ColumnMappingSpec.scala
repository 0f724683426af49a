package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Logical→physical column mapping ([[ColumnMapping]] + the Snapshots
  * verbs `renameColumn`/`dropColumn`): renames and drops are
  * metadata-only, old versions time-travel with their own column names,
  * files written before and after a rename stay byte-layout compatible
  * (writes spell physically), delete vectors and stats sidecars keep
  * applying, the SQL surface (reads, filters, INSERT, MERGE, ALTER
  * TABLE, change feed) serves the logical view, and DROP hides but does
  * not delete bytes.
  */
class ColumnMappingSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("colmap").toString

  test("rename is metadata-only: latest serves the new name over OLD " +
      "files, time travel keeps the old name, appends after the rename " +
      "write the PHYSICAL name, and reads mix both file generations") {
    val root = freshRoot()
    Snapshots.commit((0L until 10L).map(i => (i, i * 10L, i % 2))
      .toDF("id", "bal", "p"), root, "t", Seq("p"))
    val v2 = Snapshots.renameColumn(spark, root, "t", "bal", "balance")
    assert(v2 === 2L)
    // no data file was touched
    assert(Snapshots.manifest(spark, root, "t", 2L).files ===
      Snapshots.manifest(spark, root, "t", 1L).files)
    // latest: new logical name, same values
    val latest = Snapshots.readVersion(spark, root, "t", 2L)
    assert(latest.columns.toSeq === Seq("id", "balance", "p"))
    assert(latest.select("id", "balance").as[(Long, Long)].collect().toSet ===
      (0L until 10L).map(i => (i, i * 10L)).toSet)
    // time travel: v1 still spells bal
    assert(Snapshots.readVersion(spark, root, "t", 1L).columns.toSeq ===
      Seq("id", "bal", "p"))

    // append AFTER the rename: the frame uses the logical name; the file
    // must spell the PHYSICAL one so both generations read together
    Snapshots.append((10L until 14L).map(i => (i, i * 10L, i % 2))
      .toDF("id", "balance", "p"), root, "t", Seq("p"))
    val all = Snapshots.readVersion(spark, root, "t", 3L)
    assert(all.select("id", "balance").as[(Long, Long)].collect().toSet ===
      (0L until 14L).map(i => (i, i * 10L)).toSet)
    // the new file physically spells `bal` (read it raw)
    val newFiles = Snapshots.manifest(spark, root, "t", 3L).addedAtOf
      .collect { case (f, 3L) => f }.toSeq
    assert(newFiles.nonEmpty)
    val raw = spark.read.parquet(newFiles.map(f => s"$root/t/data/$f"): _*)
    assert(raw.columns.contains("bal") && !raw.columns.contains("balance"))
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN, filtered reads push down, " +
      "INSERT INTO and MERGE address the renamed column, VERSION AS OF " +
      "keeps old names") {
    val root = freshRoot()
    Snapshots.commit((0L until 20L).map(i => (i, i * 10L, i % 4))
      .toDF("id", "bal", "p"), root, "t", Seq("p"),
      statsCols = Seq("id"))
    graft.sql.GraftCatalog.install(spark, "gcm", root)
    spark.sql("ALTER TABLE gcm.t RENAME COLUMN bal TO balance")
    // logical schema + filter over the renamed column (pushdown path)
    val filtered = spark.sql(
      "SELECT id, balance FROM gcm.t WHERE balance >= 100 AND id % 2 = 0")
    val got = filtered.as[(Long, Long)].collect().toSet
    assert(got === (10L until 20L).filter(_ % 2 == 0)
      .map(i => (i, i * 10L)).toSet)
    // the filter reaches the parquet scan under the PHYSICAL name — the
    // translation preserves row-group/file skipping, it doesn't demote
    // the predicate to a post-scan filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(bal,"), plan)
    // time travel spells v1's own names
    assert(spark.sql("SELECT * FROM gcm.t VERSION AS OF 1").columns.toSeq
      === Seq("id", "bal", "p"))
    // INSERT through the catalog (physical spelling is internal)
    spark.sql("INSERT INTO gcm.t VALUES (100, 1234, 0)")
    assert(spark.sql("SELECT balance FROM gcm.t WHERE id = 100")
      .as[Long].head() === 1234L)
    // MERGE onto the renamed column
    Seq((100L, 5L), (101L, 7L)).toDF("k", "delta")
      .createOrReplaceTempView("cm_src")
    spark.sql("""MERGE INTO gcm.t AS t USING cm_src AS s ON t.id = s.k
                 WHEN MATCHED THEN UPDATE SET balance = t.balance + s.delta
                 WHEN NOT MATCHED THEN INSERT (id, balance, p)
                   VALUES (s.k, s.delta, 1)""")
    assert(spark.sql("SELECT balance FROM gcm.t WHERE id = 100")
      .as[Long].head() === 1239L)
    assert(spark.sql("SELECT balance FROM gcm.t WHERE id = 101")
      .as[Long].head() === 7L)
    // stats-sidecar pruning still keys on the physical name internally:
    // a pruned read over the renamed table stays result-identical
    val pruned = Snapshots.readVersionPruned(spark, root, "t",
      Snapshots.latestVersion(spark, root, "t").get, "id", lit(5L), lit(8L))
    assert(pruned.select("id").as[Long].collect().toSet ===
      (5L to 8L).toSet)
  }

  test("delete vectors are physically keyed: a vector written BEFORE a " +
      "rename keeps applying after it, and one written AFTER applies too") {
    val root = freshRoot()
    Snapshots.commit((0L until 12L).map(i => (i, i * 10L)).toDF("id", "bal"),
      root, "t", Seq.empty)
    Snapshots.deleteWhere(spark, root, "t", col("bal") === 30L) // v2
    Snapshots.renameColumn(spark, root, "t", "bal", "balance")  // v3
    assert(Snapshots.readVersion(spark, root, "t", 3L)
      .select("id").as[Long].collect().toSet === ((0L until 12L).toSet - 3L))
    // a delete phrased against the NEW name (vector stores the physical)
    Snapshots.deleteWhere(spark, root, "t", col("balance") === 50L) // v4
    val m4 = Snapshots.manifest(spark, root, "t", 4L)
    assert(m4.deletes.last.cols === Seq("bal"), "vector must key physically")
    assert(Snapshots.readVersion(spark, root, "t", 4L)
      .select("id").as[Long].collect().toSet ===
      ((0L until 12L).toSet - 3L - 5L))
    // SQL read path applies them identically
    graft.sql.GraftCatalog.install(spark, "gcm2", root)
    assert(spark.sql("SELECT id FROM gcm2.t").as[Long].collect().toSet ===
      ((0L until 12L).toSet - 3L - 5L))
  }

  test("DROP COLUMN hides but does not delete: bytes stay for time " +
      "travel, re-adding the name refuses until compact, partition and " +
      "last-column drops refuse, live-vector drops refuse") {
    val root = freshRoot()
    Snapshots.commit((0L until 6L).map(i => (i, s"n$i", i % 2))
      .toDF("id", "note", "p"), root, "t", Seq("p"))
    graft.sql.GraftCatalog.install(spark, "gcm3", root)
    spark.sql("ALTER TABLE gcm3.t DROP COLUMN note")
    assert(spark.sql("SELECT * FROM gcm3.t").columns.toSeq === Seq("id", "p"))
    // the bytes are still there: v1 time-travels with the column…
    assert(spark.sql("SELECT note FROM gcm3.t VERSION AS OF 1").count() === 6L)
    // …and the live files physically still carry it
    val files = Snapshots.manifest(spark, root, "t", 2L).files
    val raw = spark.read.parquet(files.map(f => s"$root/t/data/$f"): _*)
    assert(raw.columns.contains("note"))
    // re-adding the retired name refuses (old bytes would resurrect)
    val e = intercept[Exception] {
      Snapshots.append(Seq((9L, "zz", 1L)).toDF("id", "note", "p"),
        root, "t", Seq("p"))
    }
    assert(e.getMessage.contains("dropped column"), e.getMessage)
    // compact rewrites live files without the column → the name is free
    Snapshots.compact(spark, root, "t", Seq("p"), 2, Seq("id"))
    Snapshots.append(Seq((9L, "zz", 1L)).toDF("id", "note", "p"),
      root, "t", Seq("p"))
    val after = Snapshots.readVersion(spark, root, "t",
      Snapshots.latestVersion(spark, root, "t").get)
    assert(after.filter(col("id") === 9L).select("note")
      .as[String].head() === "zz")
    assert(after.filter(col("id") < 6L).filter(col("note").isNotNull)
      .count() === 0L, "old bytes must NOT resurrect post-compact")

    // refusals
    val root2 = freshRoot()
    Snapshots.commit(Seq((1L, 2L, 0L)).toDF("id", "x", "p"),
      root2, "t", Seq("p"))
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root2, "t", "p", "q")
    }
    intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root2, "t", "p")
    }
    Snapshots.deleteWhere(spark, root2, "t", col("x") === 2L)
    val ev = intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root2, "t", "x")
    }
    assert(ev.getMessage.contains("delete vector"), ev.getMessage)
  }

  test("the change feed serves a mapped table under its logical names — " +
      "adds, vector deletes, and CDC capture across the rename") {
    val root = freshRoot()
    Snapshots.commit((0L until 8L).map(i => (i, i * 10L, i % 2))
      .toDF("id", "bal", "p"), root, "t", Seq("p"))
    graft.sql.GraftCatalog.install(spark, "gcm4", root)
    spark.sql("ALTER TABLE gcm4.t RENAME COLUMN bal TO balance") // v2
    spark.conf.set(graft.sql.SnapshotCdc.WriteConf, "true")
    try spark.sql("UPDATE gcm4.t SET balance = balance + 1 WHERE id < 2")
    finally spark.conf.unset(graft.sql.SnapshotCdc.WriteConf) // v3
    spark.sql("DELETE FROM gcm4.t WHERE id = 7") // v4 (MOR vector)
    spark.conf.set("spark.graft.changes.startVersion", "1")
    spark.conf.set("spark.graft.changes.endVersion", "4")
    val feed =
      try spark.sql("SELECT id, balance, _change_type, _commit_version " +
        "FROM gcm4.t.changes")
      finally {
        spark.conf.unset("spark.graft.changes.startVersion")
        spark.conf.unset("spark.graft.changes.endVersion")
      }
    val rows = feed.as[(Long, Option[Long], String, Long)].collect().toSet
    val v1 = (0L until 8L).map(i => (i, Some(i * 10L), "insert", 1L)).toSet
    val v3 = Set[(Long, Option[Long], String, Long)](
      (0L, Some(0L), "update_preimage", 3L),
      (0L, Some(1L), "update_postimage", 3L),
      (1L, Some(10L), "update_preimage", 3L),
      (1L, Some(11L), "update_postimage", 3L))
    val v4 = Set[(Long, Option[Long], String, Long)](
      (7L, None, "delete", 4L))
    assert(rows === v1 ++ v3 ++ v4)
  }
}
