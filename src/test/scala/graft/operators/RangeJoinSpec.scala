package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals, col("p").between(col("s"), col("e")))
      .select("pid", "iid").collect().map(_.toString).sorted.toSeq

  // Deterministic pseudo-random fixture, includes NEGATIVE coordinates to
  // exercise floor-vs-truncate bin semantics and empty intervals (s > e).
  private lazy val points = (1 to 300)
    .map(i => (i.toLong, (i * 2654435761L % 401L) - 200L)).toDF("pid", "p")
  private lazy val intervals = (1 to 80).map { i =>
    val s = (i * 40503L % 379L) - 190L
    val len = i % 13L - 1L // some s > e (len == -1)
    (i.toLong, s, s + len)
  }.toDF("iid", "s", "e")

  test("binned range join ≡ naive BETWEEN join, including negatives and empty intervals") {
    val expected = naive(points, intervals)
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      val got = RangeJoin.binnedPointInterval(points, intervals, "p", "s", "e", w)
        .select("pid", "iid").collect().map(_.toString).sorted.toSeq
      assert(got === expected, s"binWidth=$w")
    }
    assert(expected.nonEmpty)
  }

  test("no duplicate pairs: each match appears exactly once") {
    val joined = RangeJoin.binnedPointInterval(points, intervals, "p", "s", "e", 7L)
    assert(joined.count() === joined.select("pid", "iid").distinct().count())
  }

  test("plans a hash/merge equi-join on the bin key, never a nested-loop product") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.binnedPointInterval(points, intervals, "p", "s", "e", 7L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
