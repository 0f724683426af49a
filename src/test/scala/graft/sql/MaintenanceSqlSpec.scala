package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._

/** SQL OPTIMIZE / VACUUM (GraftSqlParser — a delegating parser extension
  * installed by SparkTestBase's GraftExtensions, the same deployment as a
  * cluster).
  */
class MaintenanceSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("maint_sql").toString

  test("OPTIMIZE rewrites into fewer Z-ordered files, result-invariant, " +
      "vectors folded; VACUUM then retires the old files behind a " +
      "retention guard") {
    val root = freshRoot()
    // 4 appends, each touching all 4 range-tracking partitions (p=id/100)
    // = 16 files whose id boxes track the partition, so the
    // post-OPTIMIZE skip has something to prove
    (0 until 4).foreach { i =>
      Snapshots.append(
        (0L until 400L).filter(_ % 4 == i).map(k => (k, k / 100))
          .toDF("id", "p"),
        root, "t", Seq("p"), statsCols = Seq("id"))
    }
    Snapshots.deleteWhere(spark, root, "t", $"id" % 10 === 0)
    GraftCatalog.install(spark, "graftopt", root)
    val before = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM graftopt.t")
      .as[(Long, Long)].head()
    assert(before._1 === 360L) // 400 - 40 deleted

    val res = spark.sql("OPTIMIZE graftopt.t ZORDER BY (id)")
      .as[(Long, Long, Long)].head()
    val (version, nBefore, nAfter) = res
    assert(nBefore === 16L && nAfter < nBefore, res)
    // result-invariant: same rows, vectors folded into the rewrite
    assert(spark.sql("SELECT count(*) AS n, sum(id) AS s FROM graftopt.t")
      .as[(Long, Long)].head() === before)
    assert(Snapshots.manifest(spark, root, "t", version).deletes.isEmpty)
    // the sidecar re-derived: range reads still skip
    val live = Snapshots.liveFiles(spark, root, "t", version)
    val cand = Snapshots.candidateFiles(spark, root, "t", version, "id",
      lit(0L), lit(30L))
    assert(cand.size < live.size, s"$cand of ${live.size}")
    // explicit file-count spelling works too
    val res2 = spark.sql("OPTIMIZE graftopt.t INTO 2 FILES ZORDER BY (id)")
      .as[(Long, Long, Long)].head()
    assert(res2._3 <= 2L + 3L, res2) // per-partition writes may split; bounded

    // VACUUM refuses below the retention minimum (the in-flight-commit
    // race guard), pointing at the conf
    val guard = intercept[Exception] {
      spark.sql("VACUUM graftopt.t KEEP 1 VERSIONS GRACE 0 SECONDS").collect()
    }
    assert(guard.getMessage.contains("retention minimum"), guard.getMessage)
    // lowered explicitly (single-writer test), it retires everything the
    // kept version doesn't reference
    spark.conf.set("spark.graft.vacuum.minGraceMillis", "0")
    try {
      val deleted = spark.sql(
        "VACUUM graftopt.t KEEP 1 VERSIONS GRACE 0 SECONDS")
        .as[Long].head()
      assert(deleted > 0L, "old generations must be reclaimed")
      // the latest version still reads exactly the same result
      assert(spark.sql("SELECT count(*) AS n, sum(id) AS s FROM graftopt.t")
        .as[(Long, Long)].head() === before)
      // a retired version now fails loudly at resolution
      val gone = intercept[Exception] {
        spark.sql("SELECT count(*) FROM graftopt.t VERSION AS OF 1").collect()
      }
      assert(gone.getMessage.contains("vacuum") ||
        gone.getMessage.contains("not exist"), gone.getMessage)
    } finally spark.conf.unset("spark.graft.vacuum.minGraceMillis")

    // everything that is NOT one of the claimed verbs still parses
    // through Spark's own parser
    assert(spark.sql("SELECT 1 + 1 AS two").as[Int].head() === 2)
    val unknownCat = intercept[Exception] {
      spark.sql("OPTIMIZE nosuch.t").collect()
    }
    assert(unknownCat.getMessage.contains("not a registered graft catalog"),
      unknownCat.getMessage)
  }

  test("RESTORE TABLE rolls back metadata-only, carries vectors, refuses " +
      "past the vacuum horizon; claim set is frozen (comment falls " +
      "through); catalog name case-folds") {
    val root = freshRoot()
    Snapshots.commit((0L until 100L).map(k => (k, k % 4)).toDF("id", "p"),
      root, "t", Seq("p"))
    GraftCatalog.install(spark, "graftres", root)
    spark.sql("DELETE FROM graftres.t WHERE id % 10 = 0") // v2: MOR vector
    val dataFilesBefore = new java.io.File(s"$root/t/data").listFiles().length

    val r = spark.sql("RESTORE TABLE graftres.t TO VERSION AS OF 1")
      .as[(Long, Long, Long)].head()
    assert(r._1 === 3L && r._2 === 1L)
    assert(spark.sql("SELECT count(*) FROM graftres.t").as[Long].head() === 100L)
    // metadata-only: no data file written or removed
    assert(new java.io.File(s"$root/t/data").listFiles().length ===
      dataFilesBefore)
    // restore TO the vector-bearing version re-applies it
    spark.sql("RESTORE TABLE graftres.t VERSION AS OF 2")
    assert(spark.sql("SELECT count(*) FROM graftres.t").as[Long].head() === 90L)
    assert(Snapshots.manifest(spark, root, "t", 4L).deletes.nonEmpty)

    // case-insensitive catalog name (Spark resolves GRAFTRES.t; so must we)
    assert(spark.sql("RESTORE TABLE GRAFTRES.t TO VERSION AS OF 1")
      .as[(Long, Long, Long)].head()._1 === 5L)

    // vacuum away v1..v4, then restoring past the horizon names vacuum
    spark.conf.set("spark.graft.vacuum.minGraceMillis", "0")
    try spark.sql("VACUUM graftres.t KEEP 1 VERSIONS GRACE 0 SECONDS").collect()
    finally spark.conf.unset("spark.graft.vacuum.minGraceMillis")
    val gone = intercept[Exception] {
      spark.sql("RESTORE TABLE graftres.t TO VERSION AS OF 2").collect()
    }
    assert(gone.getMessage.contains("vacuum"), gone.getMessage)

    // the benign-degradation contract: a leading comment (or backticks)
    // makes the statement fall through to Spark's parser, which fails
    // LOUDLY on the unknown verb — never a half-parse here
    val fellThrough = intercept[Exception] {
      spark.sql("/* c */ RESTORE TABLE graftres.t TO VERSION AS OF 1").collect()
    }
    assert(!fellThrough.getMessage.contains("not a registered graft catalog"),
      fellThrough.getMessage)
    val backticked = intercept[Exception] {
      spark.sql("OPTIMIZE `graftres`.`t`").collect()
    }
    assert(!backticked.getMessage.contains("not a registered graft catalog"),
      backticked.getMessage)
  }
}
