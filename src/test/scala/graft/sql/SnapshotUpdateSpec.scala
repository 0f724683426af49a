package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots

/** SQL UPDATE over Snapshots-versioned tables (SnapshotUpdateRule →
  * conditional projection → partition-pruned, base-pinned commit). Same
  * deployment contract as MERGE: session extensions installed by
  * SparkTestBase.
  */
class SnapshotUpdateSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("snap_upd").toString

  private def stage(root: String): Unit = {
    Snapshots.commit(
      (0L until 40L).map(i => (i, i * 10L, (i % 4).toInt)).toDF("id", "bal", "p")
        .repartitionByRange(4, $"id"),
      root, "t", Seq("p"), statsCols = Seq("id"))
    GraftCatalog.install(spark, "graftu", root)
  }

  test("conditioned UPDATE: target-reading arithmetic, partition-pruned CoW") {
    val root = freshRoot(); stage(root)
    spark.sql("UPDATE graftu.t SET bal = bal + 5 WHERE p = 1 AND id < 20")
    val rows = spark.sql("SELECT id, bal FROM graftu.t")
      .as[(Long, Long)].collect().toMap
    assert(rows(1L) === 15L && rows(5L) === 55L && rows(13L) === 135L)
    assert(rows(21L) === 210L, "p=1 rows outside the predicate carry")
    assert(rows(2L) === 20L, "other partitions untouched")
    assert(rows.size === 40)
    // pre-update version intact; untouched partitions carry by reference
    assert(Snapshots.readVersion(spark, root, "t", 1L)
      .filter($"id" === 1L).select("bal").as[Long].head() === 10L)
    val v1 = Snapshots.liveFiles(spark, root, "t", 1L).filter(_.startsWith("p=2/"))
    val v2 = Snapshots.liveFiles(spark, root, "t", 2L).filter(_.startsWith("p=2/"))
    assert(v1.nonEmpty && v1.toSet === v2.toSet,
      s"untouched partition must carry by reference: $v1 vs $v2")
  }

  test("unconditioned UPDATE rewrites every row; no-match UPDATE is a no-op") {
    val root = freshRoot(); stage(root)
    spark.sql("UPDATE graftu.t SET bal = -bal")
    val rows = spark.sql("SELECT id, bal FROM graftu.t")
      .as[(Long, Long)].collect().toMap
    assert(rows(7L) === -70L && rows.size === 40)
    assert(Snapshots.latestVersion(spark, root, "t") === Some(2L))
    // nothing matches: no new version is published
    spark.sql("UPDATE graftu.t SET bal = 0 WHERE id > 9000")
    assert(Snapshots.latestVersion(spark, root, "t") === Some(2L))
  }

  test("UPDATE of a partition column moves rows across the layout") {
    val root = freshRoot(); stage(root)
    spark.sql("UPDATE graftu.t SET p = 0 WHERE p = 3")
    // the catalog widens integer partition-directory values to BIGINT
    val byP = spark.sql("SELECT p, count(*) AS n FROM graftu.t GROUP BY p")
      .as[(Long, Long)].collect().toMap
    assert(byP.getOrElse(3L, 0L) === 0L && byP(0L) === 20L &&
      byP(1L) === 10L && byP(2L) === 10L)
    // the emptied p=3 partition is gone from the manifest, not just empty
    assert(Snapshots.liveFiles(spark, root, "t", 2L)
      .forall(!_.startsWith("p=3/")), "p=3 must be gone from the manifest")
    assert(spark.sql("SELECT sum(bal) FROM graftu.t").as[Long].head() ===
      (0L until 40L).map(_ * 10L).sum, "moved rows keep their values")
  }

  test("UPDATE composes with merge-on-read delete vectors") {
    val root = freshRoot(); stage(root)
    // rows 8 and 12 are vector-deleted; the UPDATE's base read applies
    // the vectors, so they stay gone — including in the rewritten
    // partition, where the rewrite drops them physically
    Snapshots.deleteWhere(spark, root, "t", $"id".isin(8L, 12L))
    spark.sql("UPDATE graftu.t SET bal = bal + 1 WHERE p = 0")
    val rows = spark.sql("SELECT id, bal FROM graftu.t")
      .as[(Long, Long)].collect().toMap
    assert(!rows.contains(8L) && !rows.contains(12L),
      "vector-deleted rows must not be resurrected by the rewrite")
    assert(rows(4L) === 41L && rows(16L) === 161L, "p=0 rows updated")
    assert(rows(5L) === 50L, "other partitions untouched")
    assert(rows.size === 38)
  }

  test("UPDATE subqueries: uncorrelated scalar/IN inline at run time; " +
      "correlated refuses; non-deterministic refuses") {
    val root = freshRoot(); stage(root) // ids 0..39, bal = id*10, p = id%4
    // scalar subquery in a SET value: executed once, inlined as a literal
    spark.sql("""UPDATE graftu.t
                 SET bal = (SELECT max(id) FROM graftu.t) + 1
                 WHERE id = 3""")
    assert(spark.sql("SELECT bal FROM graftu.t WHERE id = 3")
      .as[Long].head() === 40L)
    // IN subquery in the WHERE: collected (capped) and inlined
    spark.sql("""UPDATE graftu.t SET bal = -1
                 WHERE id IN (SELECT id FROM graftu.t WHERE bal >= 370)""")
    assert(spark.sql("SELECT count(*) FROM graftu.t WHERE bal = -1")
      .as[Long].head() === 3L) // ids 37, 38, 39
    // an empty IN result updates nothing (and publishes nothing)
    val vBefore = Snapshots.latestVersion(spark, root, "t").get
    spark.sql("""UPDATE graftu.t SET bal = 0
                 WHERE id IN (SELECT id FROM graftu.t WHERE bal > 99999)""")
    assert(Snapshots.latestVersion(spark, root, "t") === Some(vBefore))
    // correlated subqueries refuse with the MERGE spelling
    val corr = intercept[Exception] {
      spark.sql("""UPDATE graftu.t AS o SET bal = 0
                   WHERE id < (SELECT max(i.bal) FROM graftu.t AS i
                               WHERE i.p = o.p)""")
    }
    assert(corr.getMessage.contains("CORRELATED"), corr.getMessage)
    // past the inline cap, the IN subquery refuses with guidance
    spark.conf.set("spark.graft.dml.maxInlineSubqueryRows", "2")
    try {
      val big = intercept[Exception] {
        spark.sql("""UPDATE graftu.t SET bal = 0
                     WHERE id IN (SELECT id FROM graftu.t)""")
      }
      assert(big.getMessage.contains("maxInlineSubqueryRows"), big.getMessage)
    } finally spark.conf.unset("spark.graft.dml.maxInlineSubqueryRows")
  }

  test("UPDATE refusals are loud: non-versioned table") {
    val root = freshRoot(); stage(root)
    assert(Snapshots.latestVersion(spark, root, "t") === Some(1L))
    // non-deterministic predicates/values are refused: the WHERE is
    // evaluated once for touched-partition discovery and again for the
    // rewrite — rand() could hit different rows per pass
    val nondetV = intercept[Exception] {
      spark.sql("UPDATE graftu.t SET bal = CAST(rand() * 100 AS BIGINT)")
    }
    assert(nondetV.getMessage.contains("non-deterministic"), nondetV.getMessage)
    val nondetW = intercept[Exception] {
      spark.sql("UPDATE graftu.t SET bal = 0 WHERE rand() < 0.5")
    }
    assert(nondetW.getMessage.contains("non-deterministic"), nondetW.getMessage)
    assert(Snapshots.latestVersion(spark, root, "t") === Some(1L))
  }
}
