package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Driver-side sidecar I/O (SidecarIO + Snapshots.writeSidecarDriverSide):
  * the fast path must produce sidecars indistinguishable from the Spark
  * path to every consumer (spark.read, SidecarSkip, stats carry), and
  * anything outside its narrow type set must fall back, not fail.
  */
class SidecarIOSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("sidecar_io").toString

  test("driver-written sidecar: Spark-readable, stats carry across commits") {
    val root = freshRoot()
    val df1 = (0L until 40L).map(i => (i, s"s$i", (i % 4).toInt))
      .toDF("id", "name", "p").repartitionByRange(4, $"id")
    Snapshots.commit(df1, root, "t", Seq("p"), statsCols = Seq("id", "name"))
    val sc1 = spark.read.parquet(s"$root/_snapshots/t/stats_v1")
    assert(sc1.columns.sorted.toSeq ===
      Seq("bytes", "file", "max_id", "max_name", "min_id", "min_name", "rows"))
    assert(sc1.count() === Snapshots.liveFiles(spark, root, "t", 1L).size)
    // every added file carries exact bytes + rows and real min/max
    assert(sc1.filter($"bytes".isNull || $"rows".isNull ||
      $"min_id".isNull || $"max_name".isNull).count() === 0)
    assert(sc1.agg(sum($"rows")).as[Long].head() === 40L)
    assert(sc1.agg(min($"min_id"), max($"max_id"))
      .as[(Long, Long)].head() === ((0L, 39L)))

    // second commit replaces ONE partition: kept files' stats must carry
    // forward through the driver-side merge, the replaced partition's
    // files get fresh stats
    Snapshots.commit(Seq((100L, "zz", 1)).toDF("id", "name", "p"),
      root, "t", Seq("p"), statsCols = Seq("id", "name"))
    val sc2 = spark.read.parquet(s"$root/_snapshots/t/stats_v2")
    assert(sc2.count() === Snapshots.liveFiles(spark, root, "t", 2L).size)
    assert(sc2.filter($"rows".isNull).count() === 0, "carried stats survive")
    assert(sc2.agg(max($"max_id")).as[Long].head() === 100L)
    // pruning consumes the driver-written sidecar: a window over one
    // carried file's range opens a strict subset
    val cands = Snapshots.candidateFiles(spark, root, "t", 2L, "id",
      lit(0L), lit(5L))
    assert(cands.nonEmpty &&
      cands.size < Snapshots.liveFiles(spark, root, "t", 2L).size)
  }

  test("stats column outside the narrow set falls back to the Spark path") {
    val root = freshRoot()
    // DecimalType is not in SidecarIO's supported set — the commit must
    // still produce a correct sidecar (via Spark), never fail or skip
    val df = (0L until 10L).map(i => (i, BigDecimal(i) / 4, (i % 2).toInt))
      .toDF("id", "dec", "p")
    Snapshots.commit(df, root, "t", Seq("p"), statsCols = Seq("dec"))
    val sc = spark.read.parquet(s"$root/_snapshots/t/stats_v1")
    assert(sc.columns.contains("min_dec") && sc.columns.contains("max_dec"))
    assert(sc.count() === Snapshots.liveFiles(spark, root, "t", 1L).size)
    assert(sc.filter($"min_dec".isNull).count() === 0)
    // and a follow-up commit with a SUPPORTED stats set still merges the
    // legacy decimal sidecar correctly (driver path refuses, Spark path
    // unions) — the min_dec column survives as null-or-carried
    Snapshots.commit(Seq((50L, BigDecimal(9), 0)).toDF("id", "dec", "p"),
      root, "t", Seq("p"), statsCols = Seq("dec"))
    val sc2 = spark.read.parquet(s"$root/_snapshots/t/stats_v2")
    assert(sc2.count() === Snapshots.liveFiles(spark, root, "t", 2L).size)
  }

  test("date stats ride the driver path; unionByName aligns evolving columns") {
    val root = freshRoot()
    val df = Seq((1L, java.sql.Date.valueOf("2023-01-03"), 0),
        (2L, java.sql.Date.valueOf("2023-06-30"), 1))
      .toDF("id", "d", "p")
    Snapshots.commit(df, root, "t", Seq("p"), statsCols = Seq("d"))
    // second commit tracks a DIFFERENT stats column: allowMissing union
    Snapshots.commit(Seq((3L, java.sql.Date.valueOf("2024-02-02"), 1))
      .toDF("id", "d", "p"), root, "t", Seq("p"), statsCols = Seq("id"))
    val sc = spark.read.parquet(s"$root/_snapshots/t/stats_v2")
    assert(sc.columns.toSet.intersect(Set("min_d", "min_id")).size === 2)
    val minD = sc.filter($"min_d".isNotNull).agg(min($"min_d"))
      .as[java.sql.Date].head()
    assert(minD === java.sql.Date.valueOf("2023-01-03"))
    assert(sc.filter($"min_id" === 3L).count() === 1L)
  }
}
