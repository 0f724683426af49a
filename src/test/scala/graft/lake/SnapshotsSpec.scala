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

  test("vacuum keeps only the requested versions' files; survivors still read") {
    val root = freshRoot()
    Snapshots.commit(Seq((1L, 2020)).toDF("id", "year"), root, "t", Seq("year"))
    Snapshots.commit(Seq((2L, 2020)).toDF("id", "year"), root, "t", Seq("year"))
    Snapshots.commit(Seq((3L, 2020)).toDF("id", "year"), root, "t", Seq("year"))
    val deleted = Snapshots.vacuum(spark, root, "t", keepVersions = 1)
    assert(deleted.nonEmpty) // v1+v2's superseded files are gone
    assert(Snapshots.readVersion(spark, root, "t", 3L)
      .select("id").as[Long].collect().toSeq === Seq(3L))
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, root, "t", 1L)
    }
  }
}
