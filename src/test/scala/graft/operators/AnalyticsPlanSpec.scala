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

  // -- round-8 additions: plan gates for the suite's most expensive
  //    composites (q108/q109/q111), so a plan regression fails CI instead
  //    of silently inflating the bench --

  /** Final AQE section only (the string repeats under "== Initial Plan ==").*/
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q109 curation pipeline: no cartesian/nested-loop, bounded exchanges, pruned scan") {
    val df = graft.queries.PipelineQueries.q109CurationPipeline(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // every join in the five-stage DAG is equi (LSH bands, anti/semi on
    // doc_id, broadcast manifest) — a nested loop anywhere is a regression
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 30, s"exchange blowup ($exchanges):\n$plan")
    // column pruning must survive the five stages: the documents scan
    // reads exactly the three columns the pipeline consumes
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    val docReads = reads.filter(_.contains("text"))
    assert(docReads.nonEmpty, s"no documents scan found:\n$plan")
    docReads.foreach { rs =>
      assert(!rs.contains("n_chars") && !rs.contains("lang"),
        s"documents scan reads unused columns ($rs):\n$plan")
    }
  }

  test("q111 IVF-PQ: cross joins are broadcast-dim only, no cartesian, bounded exchanges") {
    val df = graft.queries.PipelineQueries.q111IvfPq(spark, sf)
    val plan = finalPlan(df)
    // a CartesianProduct would mean a dim relation lost its broadcast
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONLY nested loops allowed are the two intentional
    // corpus×centroids / queries×centroids broadcast crossJoins (plus
    // AQE-reused copies); each must carry a broadcast build side
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnl <= 3, s"unexpected nested-loop count $bnl:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 30, s"exchange blowup ($exchanges):\n$plan")
  }

  test("q108 stateful CDC merge plans as one full-outer equi-join (per micro-batch shape)") {
    import org.apache.spark.sql.functions._
    // the exact per-batch plan q108's foreachBatch builds, on fixture data
    val ev = graft.queries.Tables.events(spark, sf)
    val ops = ev.select(col("user_id"), col("ts_ns"), col("event_id"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      round(col("value") * 100).cast("long").as("cents"))
    val base = ev.select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0).withColumn("balance_cents", lit(0L))
    val state = Cdc.seedState(base, ops, Seq("ts_ns", "event_id"))
    val merged = Cdc.mergeStateful(state, ops,
      keyCols = Seq("user_id"), seqCols = Seq("ts_ns", "event_id"),
      opCol = "op", deleteOp = "D",
      valueCols = Map("balance_cents" -> col("cents")))
    val plan = finalPlan(merged)
    assert("FullOuter".r.findAllIn(plan).length === 1,
      s"expected exactly one full-outer join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    // ops-compaction window is the only window in the merge
    assert("Window \\[".r.findAllIn(plan).length <= 1, plan)
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 10, s"exchange blowup ($exchanges):\n$plan")
  }

  // -- round-8 second leg: plan gates for the new operator families --

  test("q135 SemDeDup: one broadcast centroid crossJoin, pair join is equi, bounded exchanges") {
    val df = graft.queries.CurationQueries.q135SemDedup(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONLY nested loop allowed is the intentional corpus×centroids
    // broadcast (plus AQE reuse); the within-cell pair join must be a
    // hash/sort-merge equi-join on cell, never a product
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnl <= 2, s"unexpected nested-loop count $bnl:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 15, s"exchange blowup ($exchanges):\n$plan")
  }

  test("q141 phrase search: posting joins are equi, no nested loop, no fact window") {
    val df = graft.queries.CurationQueries.q141PhraseSearch(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Window ["), s"phrase search must not window:\n$plan")
  }

  test("q143/q144: only group-partitioned windows anywhere (no global sort state)") {
    val h = graft.queries.CurationQueries.q143HistQuantiles(spark, sf)
    assert(!h.queryExecution.optimizedPlan.toString
      .contains("windowspecdefinition(ORDER"),
      "q143 contains a single-partition window")
    val r = graft.queries.CurationQueries.q144RrfFusion(spark, sf)
    assert(!r.queryExecution.optimizedPlan.toString
      .contains("windowspecdefinition(ORDER"),
      "q144 contains a single-partition window")
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

  // -- round-8 third-leg plan gates: graph wave + prefix join + the
  //    as-of/trailing family --

  test("q149 triangles: every join is equi (hash/sort-merge), no nested loop") {
    val df = graft.queries.GraphQueries.q149Triangles(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"),
      s"a wedge/closure join lost its equi keys:\n$plan")
  }

  test("q152 assoc rules: item counts broadcast; scalar n is a broadcast 1-row join") {
    val df = graft.queries.GraphQueries.q152AssocRules(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the lone nested-loop is the 1-row totals frame by construction —
    // anything joining data-sized relations that way is a regression
    val bnl = "BroadcastNestedLoop".r.findAllIn(plan).length
    assert(bnl <= 1, s"unexpected nested-loop joins:\n$plan")
  }

  test("q158 prefix jaccard: candidate and verify joins are equi, no fact window") {
    val df = graft.queries.GraphQueries.q158PrefixJaccard(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"),
      s"prefix/verify join lost its equi keys:\n$plan")
    // the only window is the per-doc rank (partitioned by id)
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("windowspecdefinition(ORDER"),
      "q158 contains a single-partition window")
  }

  test("q156/q157 as-of family: one shuffle shape, key-partitioned windows only") {
    for ((name, df) <- Seq(
      "q156" -> graft.queries.RelationalQueries2.q156AsofNearest(spark, sf),
      "q157" -> graft.queries.SeriesQueries.q157TrailingAgg(spark, sf))) {
      val plan = finalPlan(df)
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"$name:\n$plan")
      assert(!df.queryExecution.optimizedPlan.toString
        .contains("windowspecdefinition(ORDER"),
        s"$name contains a single-partition window")
    }
  }

  // -- round-8 fourth-through-tenth-leg plan gates --

  test("indicator/risk/backtest windows are all key-partitioned, no joins") {
    for ((name, df) <- Seq(
      "q159" -> graft.queries.SeriesQueries.q159Drawdown(spark, sf),
      "q161" -> graft.queries.SeriesQueries.q161Bollinger(spark, sf),
      "q169" -> graft.queries.SeriesQueries.q169HistoricalVar(spark, sf),
      "q170" -> graft.queries.SeriesQueries.q170Momentum(spark, sf),
      "q176" -> graft.queries.SeriesQueries.q176FlowImbalance(spark, sf))) {
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("windowspecdefinition(ORDER"),
        s"$name contains a single-partition window")
      val plan = finalPlan(df)
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
    }
  }

  test("q172 join IVM: every join is equi; deltas broadcast at fixture size") {
    val df = graft.queries.LakeQueries.q172JoinIvm(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("Join"), plan) // the maintained view joins exist
  }

  test("q174 split adjustment: action fold joins the facts ONCE, no window") {
    val df = graft.queries.SeriesQueries.q174SplitAdjust(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // exactly one join of facts to the folded per-security action arrays
    // (plus the rank join building the planted fixture actions)
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("windowspecdefinition(ORDER"),
      "q174 contains a single-partition window")
  }

  test("q167 perceptual-hash pairs: banded equi-join only (global gate backs this)") {
    val df = graft.queries.MultimodalQueries.q167ImageDhash(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"hamming join lost its (band, bv) keys:\n$plan")
  }

  // -- round-9 additions --

  test("q184 video near-dup: all equi joins, no nested loop, no fact window") {
    val df = graft.queries.MultimodalQueries.q184VideoNearDup(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"candidate/alignment joins lost their keys:\n$plan")
    // the best-offset pick is a groupBy max(struct), never a window
    assert(!plan.contains("Window ["), s"best-offset fell back to a window:\n$plan")
  }

  test("q186 probe: eval shingle set joins as a BROADCAST; no nested loop") {
    val df = graft.queries.CurationQueries.q186ProbeDecontamination(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingle set must broadcast (it is eval-suite-sized):\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop allowed is assignCells' broadcast-DIM centroid
    // crossJoin (the audited pattern); anything non-broadcast is a bug
    assert(!plan.contains("BroadcastNestedLoopJoin BuildLeft") ||
      plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
  }

  test("q187 DSIR: token joins are equi; selection is a threshold filter, no top-k funnel") {
    val df = graft.queries.TrainingQueries.queries("q187_dsir_select")(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // selection is quantile-threshold + filter: a corpus-proportional
    // TakeOrderedAndProject (per-partition heaps of size fraction·N
    // merged in ONE task) must never reappear here
    assert(!plan.contains("TakeOrderedAndProject"),
      s"selection must be threshold-filter, not a global top-k heap:\n$plan")
    // no fact-sized global sort either — the histogram prefix sum and the
    // boundary row number are the only ordered passes, both distributed
    assert(!plan.contains("GlobalLimit"), plan)
  }
}
