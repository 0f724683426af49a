package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._

/** SQL MERGE INTO over Snapshots-versioned tables (SnapshotMergeRule →
  * Cdc.merge → partition-pruned commit). The session extensions are
  * installed by SparkTestBase — the same deployment contract as a
  * cluster (`spark.sql.extensions=graft.expressions.GraftExtensions`).
  */
class SnapshotMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snap_merge").toString

  private def stage(root: String): Unit = {
    Snapshots.commit(
      (0L until 40L).map(i => (i, s"v$i", (i % 4).toInt)).toDF("id", "v", "p")
        .repartitionByRange(4, $"id"),
      root, "t", Seq("p"), statsCols = Seq("id"))
    GraftCatalog.install(spark, "graftm", root)
  }

  test("MERGE upsert: matched rows update, unmatched insert, re-run idempotent") {
    val root = freshRoot(); stage(root)
    Seq((1L, "NEW1", 1), (2L, "NEW2", 2), (100L, "INS", 0))
      .toDF("id", "v", "p").createOrReplaceTempView("m_src")

    spark.sql("""MERGE INTO graftm.t AS tgt USING m_src AS s ON tgt.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(Snapshots.latestVersion(spark, root, "t") === Some(2L))
    val rows = spark.sql("SELECT id, v FROM graftm.t")
      .as[(Long, String)].collect().toMap
    assert(rows.size === 41 && rows(1L) === "NEW1" && rows(2L) === "NEW2" &&
      rows(100L) === "INS" && rows(3L) === "v3")
    // partition-pruned CoW: p=3 was untouched — its files carried over
    val v1 = Snapshots.liveFiles(spark, root, "t", 1L).filter(_.startsWith("p=3/"))
    val v2 = Snapshots.liveFiles(spark, root, "t", 2L).filter(_.startsWith("p=3/"))
    assert(v1.nonEmpty && v1.toSet === v2.toSet,
      s"untouched partition must carry by reference: $v1 vs $v2")
    // idempotent re-run: new version, same content
    spark.sql("""MERGE INTO graftm.t AS tgt USING m_src AS s ON tgt.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT id, v FROM graftm.t")
      .as[(Long, String)].collect().toMap === rows)
  }

  test("MERGE as the CDC verb: conditioned DELETE routes, UPDATE otherwise") {
    val root = freshRoot(); stage(root)
    Seq((1L, "upd", "U", 1), (8L, "x", "D", 0), (200L, "ins", "U", 0))
      .toDF("id", "v", "op", "p").createOrReplaceTempView("m_ops")

    spark.sql("""MERGE INTO graftm.t AS tgt USING m_ops AS s ON tgt.id = s.id
                 WHEN MATCHED AND s.op = 'D' THEN DELETE
                 WHEN MATCHED THEN UPDATE SET v = s.v, p = s.p
                 WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id, s.v, s.p)""")
    val rows = spark.sql("SELECT id, v FROM graftm.t")
      .as[(Long, String)].collect().toMap
    assert(!rows.contains(8L), "matched DELETE must drop the row")
    assert(rows(1L) === "upd" && rows(200L) === "ins" && rows(5L) === "v5")
    assert(rows.size === 40) // 40 - 1 deleted + 1 inserted
  }

  test("update-only MERGE never inserts; insert-only never updates") {
    val root = freshRoot(); stage(root)
    Seq((1L, "U1", 1), (500L, "NOPE", 0)).toDF("id", "v", "p")
      .createOrReplaceTempView("m_uo")
    spark.sql("""MERGE INTO graftm.t AS tgt USING m_uo AS s ON tgt.id = s.id
                 WHEN MATCHED THEN UPDATE SET *""")
    val afterU = spark.sql("SELECT id, v FROM graftm.t")
      .as[(Long, String)].collect().toMap
    assert(afterU(1L) === "U1" && !afterU.contains(500L) && afterU.size === 40)

    spark.sql("""MERGE INTO graftm.t AS tgt USING m_uo AS s ON tgt.id = s.id
                 WHEN NOT MATCHED THEN INSERT *""")
    val afterI = spark.sql("SELECT id, v FROM graftm.t")
      .as[(Long, String)].collect().toMap
    assert(afterI(1L) === "U1", "insert-only must not rewrite matched rows")
    assert(afterI(500L) === "NOPE" && afterI.size === 41)
  }

  test("MERGE refusals are loud: dup source keys, non-equi ON, target-reading values") {
    val root = freshRoot(); stage(root)
    Seq((1L, "a", 1), (1L, "b", 1)).toDF("id", "v", "p")
      .createOrReplaceTempView("m_dup")
    val dup = intercept[Exception] {
      spark.sql("""MERGE INTO graftm.t AS tgt USING m_dup AS s ON tgt.id = s.id
                   WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(dup.getMessage.contains("more than once"), dup.getMessage)
    // nothing committed by the refused statement
    assert(Snapshots.latestVersion(spark, root, "t") === Some(1L))

    Seq((1L, "a", 1)).toDF("id", "v", "p").createOrReplaceTempView("m_one")
    val nonEqui = intercept[Exception] {
      spark.sql("""MERGE INTO graftm.t AS tgt USING m_one AS s ON tgt.id < s.id
                   WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(nonEqui.getMessage.contains("non-equality"), nonEqui.getMessage)
    val tgtRef = intercept[Exception] {
      spark.sql("""MERGE INTO graftm.t AS tgt USING m_one AS s ON tgt.id = s.id
                   WHEN MATCHED THEN UPDATE SET v = concat(tgt.v, s.v)""")
    }
    assert(tgtRef.getMessage.contains("target columns"), tgtRef.getMessage)
  }

  test("a MERGE that empties a partition really empties it") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p"),
      root, "t", Seq("p"))
    GraftCatalog.install(spark, "graftm", root)
    Seq((1L, "D")).toDF("id", "op").createOrReplaceTempView("m_del")
    spark.sql("""MERGE INTO graftm.t AS tgt USING m_del AS s ON tgt.id = s.id
                 WHEN MATCHED AND s.op = 'D' THEN DELETE""")
    assert(spark.sql("SELECT id FROM graftm.t").as[Long].collect().toSet ===
      Set(2L))
    assert(Snapshots.liveFiles(spark, root, "t", 2L)
      .forall(_.startsWith("p=1/")), "p=0 must be gone from the manifest")
  }
}
