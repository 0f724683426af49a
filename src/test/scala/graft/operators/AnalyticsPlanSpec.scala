package graft.operators

import graft.SparkTestBase

/** Plan audits for the round-5 analytics operators: the scale posture
  * (bounded-heap top-k, broadcast of tiny relations, single-exchange
  * merges, no single-partition windows over fact-sized relations) must
  * be visible in the physical plan, not just intended.
  */
class AnalyticsPlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q102 runs on the TopKPerKey bounded heaps, not a window sort") {
    val df = graft.queries.PipelineQueries.q102SourceCaps(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), s"per-group cap fell back to a window sort:\n$plan")
  }

  test("q103 broadcasts the per-prev totals (pair relation ≤ |types|²)") {
    val df = graft.queries.PipelineQueries.q103EventTransitions(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("q107 CDC merge is ONE full-outer equi-join, no nested loop, no second window") {
    val df = graft.queries.LakeQueries.q107CdcMerge(spark, sf)
    df.collect()
    // the AQE string repeats the tree under "== Initial Plan ==" — audit
    // the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val outerJoins = "FullOuter".r.findAllIn(plan).length
    assert(outerJoins === 1, s"expected exactly one full-outer join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // "Window [" is the window exec; WindowGroupLimit is the bounded
    // partial pushdown (desirable) and doesn't count against this
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows <= 1, s"compaction must be the only window:\n$plan")
  }

  test("q106 windows are __pid-partitioned only (GlobalOrder posture)") {
    val df = graft.queries.PipelineQueries.q106RfmSegments(spark, sf)
    // optimizedPlan: same fingerprint GlobalOrderSpec pins — an
    // UNpartitioned window renders windowspecdefinition(ORDER...; the
    // legitimate per-partition running sums render with __pid first
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(ORDER"),
      "q106 contains a single-partition window:\n" + plan)
  }
}
