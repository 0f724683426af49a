package graft

/** The driver contract itself: entry() smoke, full registry integrity. */
class SparkEntrySpec extends SparkTestBase {

  test("entry() returns rows on the smoke fixture (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without queries: ${os -- qs}")
    assert(qs.forall(_.matches("q[0-9]+[a-z0-9_]*")), qs.filterNot(_.matches("q[0-9]+[a-z0-9_]*")))
    assert(qs.size === 238)
    assert(os.size === 238)
  }

  test("all queries build a plan at smoke scale without throwing; none is cartesian") {
    SparkEntry.queries.foreach { case (name, fn) =>
      // plan construction only — execution is Verify/Bench territory
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
      // GLOBAL scale invariant: a CartesianProduct means a cross join lost
      // its broadcast (intentional dim crossJoins plan as
      // BroadcastNestedLoopJoin, never CartesianProduct) — at 100 TB that
      // is a cluster-killer, so it fails CI for EVERY registered query
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      // GLOBAL scale invariant #2: TakeOrderedAndProject merges its
      // per-partition size-k heaps in ONE final task, so a
      // corpus-proportional k (a fraction-style `orderBy().limit(k)`
      // selection) funnels that fraction of the corpus through a single
      // executor. Legit top-k limits in the registry are small constants
      // (topK ≤ 50, k=100 fixed-size samples, nlist-sized seeds); anything
      // bigger at smoke scale is a corpus-derived k and must use a
      // threshold/filter shape instead (see ImportanceResampling.select).
      val bigK = TopKLimit.findAllMatchIn(plan).map(_.group(1).toInt)
        .filter(_ > MaxTopKLimit).toSeq
      assert(bigK.isEmpty,
        s"$name plans TakeOrderedAndProject with limit(s) ${bigK.mkString(",")} " +
          s"> $MaxTopKLimit — corpus-proportional top-k; use a quantile " +
          s"threshold + filter instead:\n$plan")
      // GLOBAL scale invariant #3: a BroadcastNestedLoopJoin is fine when
      // its BUILD (broadcast) side is dimension-sized — but a build side
      // that scans a FACT table with no cardinality-collapsing node
      // (aggregate / distinct / limit) between the scan and the broadcast
      // ships that table to every executor and nested-loops against it: a
      // cluster-killer at 100 TB that hides at smoke scale. Legit shapes
      // (1-row agg frames, distinct key panels) all pass the collapse
      // check because distinct/agg/limit plan as Aggregate/Limit nodes.
      physicalNodes(df.queryExecution.sparkPlan).foreach {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _ => b.right
          }
          // path-sensitive: each fact-scan LEAF must have a collapsing node
          // on its OWN root→leaf path (an aggregated dimension elsewhere in
          // the build tree must not excuse an uncollapsed fact scan), and
          // scans are resolved by the file relation's root paths, not plan
          // toString (which truncates long locations)
          val bad = uncollapsedFactScans(build, collapsed = false)
          assert(bad.isEmpty,
            s"$name broadcasts an uncollapsed fact-table scan into a " +
              s"BroadcastNestedLoopJoin build side (leaves: " +
              s"${bad.map(_.nodeName).mkString(",")}):\n${build.toString}")
        case _ =>
      }
    }
  }

  private def physicalNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: p.children.flatMap(physicalNodes)

  /** Fact-table file scans with NO cardinality-collapsing ancestor
    * (Aggregate / Limit / TakeOrdered) on their path from `p`.
    */
  private def uncollapsedFactScans(
      p: org.apache.spark.sql.execution.SparkPlan, collapsed: Boolean)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val here = collapsed ||
      p.nodeName.contains("Aggregate") || p.nodeName.contains("Limit") ||
      p.nodeName.contains("TakeOrdered")
    p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if !here && f.relation.location.rootPaths.exists(rp =>
            FactTables.exists(t => rp.toString.contains(s"$t.parquet"))) =>
        Seq(f)
      case _ => p.children.flatMap(uncollapsedFactScans(_, here))
    }
  }

  private val FactTables =
    Seq("lineitem", "orders", "events", "documents", "embeddings")
  private val TopKLimit = """TakeOrderedAndProject\(limit=(\d+)""".r
  private val MaxTopKLimit = 128
}
