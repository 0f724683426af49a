package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String = {
    val root = java.nio.file.Files.createTempDirectory("snap_spec").toString
    root
  }

  test("commits are dynamic-overwrite; every version stays readable") {
    val root = freshRoot()
    val v1 = Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021)).toDF("id", "v", "year")
    assert(Snapshots.commit(v1, root, "t", Seq("year")) === 1L)
    // overwrite year=2020 only
    val v2 = Seq((9L, "z", 2020)).toDF("id", "v", "year")
    assert(Snapshots.commit(v2, root, "t", Seq("year")) === 2L)
    // brand-new partition, nothing replaced
    val v3 = Seq((4L, "d", 2022)).toDF("id", "v", "year")
    assert(Snapshots.commit(v3, root, "t", Seq("year")) === 3L)

    def rows(ver: Long) = Snapshots.readVersion(spark, root, "t", ver)
      .select("id", "v", "year").as[(Long, String, Int)].collect().toSet
    assert(rows(1L) === Set((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021)))
    assert(rows(2L) === Set((9L, "z", 2020), (3L, "c", 2021)))
    assert(rows(3L) === Set((9L, "z", 2020), (3L, "c", 2021), (4L, "d", 2022)))
    // partition pruning still applies on a time-travel read
    val plan = Snapshots.readVersion(spark, root, "t", 3L)
      .filter($"year" === 2022).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("diff tags multiset changes as insert/delete; updates become both") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("id", "v", "year"),
      root, "t", Seq("year"))
    Snapshots.commit(Seq((1L, "A", 2020)).toDF("id", "v", "year"),
      root, "t", Seq("year")) // update id=1, leave 2021 alone
    val d = Snapshots.diff(spark, root, "t", 1L, 2L)
      .select("change_type", "id", "v").as[(String, Long, String)].collect().toSet
    assert(d === Set(("delete", 1L, "a"), ("insert", 1L, "A")))
  }

  test("statsCols commit writes a sidecar; readVersionPruned skips files, result ≡ unpruned") {
    val root = freshRoot()
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("id", "grp")
      .repartitionByRange(4, $"id") // 4 files, each owning a tight id range
    Snapshots.commit(df, root, "t", Seq.empty, statsCols = Seq("id"))
    val cand = Snapshots.candidateFiles(spark, root, "t", 1L, "id", lit(10), lit(20))
    assert(cand.nonEmpty && cand.size < 4, s"expected pruning, got $cand")
    val pruned = Snapshots.readVersionPruned(spark, root, "t", 1L, "id", lit(10), lit(20))
      .select("id").as[Long].collect().toSet
    assert(pruned === (10L to 20L).toSet)
  }

  test("stats carry forward across a non-stats commit; new files read conservatively") {
    val root = freshRoot()
    Snapshots.commit((0L until 100L).toDF("id").repartitionByRange(4, $"id"),
      root, "t", Seq.empty, statsCols = Seq("id"))
    // append-only commit WITHOUT statsCols: v1 stats must carry forward,
    // v2's own files get null stats (conservative)
    Snapshots.commit((1000L until 1100L).toDF("id").repartitionByRange(4, $"id"),
      root, "t", Seq.empty)
    val cand = Snapshots.candidateFiles(spark, root, "t", 2L, "id", lit(10), lit(20))
    assert(cand.size < 8 && cand.size >= 5, // ≤2 v1 files prune in, all 4 v2 files stay
      s"expected carried v1 pruning + conservative v2 files, got $cand")
    val pruned = Snapshots.readVersionPruned(spark, root, "t", 2L, "id", lit(10), lit(20))
      .select("id").as[Long].collect().toSet
    assert(pruned === (10L to 20L).toSet)
  }

  test("compact rewrites range-clustered with fresh stats; time-travel AND post-compact reads prune") {
    val root = freshRoot()
    Snapshots.commit((0L until 100L).toDF("id").repartitionByRange(4, $"id"),
      root, "t", Seq.empty, statsCols = Seq("id"))
    Snapshots.commit((1000L until 1100L).toDF("id").repartitionByRange(4, $"id"),
      root, "t", Seq.empty, statsCols = Seq("id"))
    val v3 = Snapshots.compact(spark, root, "t", Seq.empty, numFiles = 4,
      clusterCols = Seq("id"), statsCols = Seq("id"))
    assert(v3 === 3L)
    // post-compaction read prunes on the FRESH stats (files re-clustered)
    val cand3 = Snapshots.candidateFiles(spark, root, "t", 3L, "id", lit(10), lit(20))
    assert(cand3.size < 4, s"post-compact pruning failed: $cand3")
    assert(Snapshots.readVersionPruned(spark, root, "t", 3L, "id", lit(10), lit(20))
      .select("id").as[Long].collect().toSet === (10L to 20L).toSet)
    // time-travel read at v1 prunes on v1's OWN committed stats
    val cand1 = Snapshots.candidateFiles(spark, root, "t", 1L, "id", lit(10), lit(20))
    assert(cand1.size < 4, s"time-travel pruning failed: $cand1")
    assert(Snapshots.readVersionPruned(spark, root, "t", 1L, "id", lit(10), lit(20))
      .select("id").as[Long].collect().toSet === (10L to 20L).toSet)
    // compaction replaced the live set but older versions still read intact
    assert(Snapshots.readVersion(spark, root, "t", 2L).count() === 200L)
    assert(Snapshots.readVersion(spark, root, "t", 3L).count() === 200L)
  }

  test("no sidecar → pruned read degrades to the plain filtered scan") {
    val root = freshRoot()
    Snapshots.commit((0L until 40L).map(i => (i, (2020 + i % 2).toInt))
      .toDF("id", "year"), root, "t", Seq("year")) // no statsCols anywhere
    val cand = Snapshots.candidateFiles(spark, root, "t", 1L, "id", lit(0), lit(5))
    assert(cand.size === 2) // both partition files: fully conservative
    assert(Snapshots.readVersionPruned(spark, root, "t", 1L, "id", lit(0), lit(5))
      .select("id").as[Long].collect().toSet === (0L to 5L).toSet)
  }

  test("vacuum keeps only the requested versions' files; survivors still read") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, 2020)).toDF("id", "year"), root, "t", Seq("year"),
      statsCols = Seq("id"))
    Snapshots.commit(Seq((2L, 2020)).toDF("id", "year"), root, "t", Seq("year"),
      statsCols = Seq("id"))
    Snapshots.commit(Seq((3L, 2020)).toDF("id", "year"), root, "t", Seq("year"),
      statsCols = Seq("id"))
    val deleted = Snapshots.vacuum(spark, root, "t", keepVersions = 1)
    assert(deleted.nonEmpty) // v1+v2's superseded files are gone
    assert(Snapshots.readVersion(spark, root, "t", 3L)
      .select("id").as[Long].collect().toSeq === Seq(3L))
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, root, "t", 1L)
    }
    // dropped versions' stats sidecars are gone too; the survivor's stays
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/_snapshots/t/stats_v1")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/_snapshots/t/stats_v2")))
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/_snapshots/t/stats_v3")))
  }
}
