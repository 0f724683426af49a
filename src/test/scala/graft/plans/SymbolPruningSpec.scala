package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class SymbolPruningSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val lakeDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sidlake").toString
    // 10 securities × 100 rows, partitioned by security_id; AAA maps to
    // sids {1, 7} (a rename-reuse), everything else one sid each
    val rows = (1 to 10).flatMap { sid =>
      val sym = if (sid == 1 || sid == 7) "AAA" else s"SYM$sid"
      (1 to 100).map(i => (sid.toLong, sym, i, i * 1.5))
    }
    rows.toDF("security_id", "symbol", "seq", "px")
      .write.partitionBy("security_id").mode("overwrite").parquet(d)
    d
  }

  private def master = Seq(
    (1L, "AAA"), (7L, "AAA"), (2L, "SYM2"), (3L, "SYM3"), (4L, "SYM4"),
    (5L, "SYM5"), (6L, "SYM6"), (8L, "SYM8"), (9L, "SYM9"), (10L, "SYM10"))
    .toDF("security_id", "symbol")

  private def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect() // force planning + execution
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount).sum[Int]
  }

  test("symbol predicate is rewritten to a security_id partition filter") {
    SymbolPruning.register(master, lakeDir)
    SymbolPruning.install(spark)
    try {
      val q = spark.read.parquet(lakeDir).filter($"symbol" === "AAA")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("security_id"), optimized)
      assert(scannedPartitions(q) === 2) // only sids 1 and 7 read
      assert(q.count() === 200) // result unchanged
    } finally SymbolPruning.clear()
  }

  test("without registration the plan is untouched and all partitions scan") {
    SymbolPruning.clear()
    SymbolPruning.install(spark)
    val q = spark.read.parquet(lakeDir).filter($"symbol" === "AAA")
    assert(scannedPartitions(q) === 10)
    assert(q.count() === 200)
  }

  test("rewrite preserves results for every symbol (invariance)") {
    SymbolPruning.install(spark)
    val expect = spark.read.parquet(lakeDir)
      .groupBy($"symbol").count().as[(String, Long)].collect().toMap
    SymbolPruning.register(master, lakeDir)
    try {
      expect.foreach { case (sym, n) =>
        val q = spark.read.parquet(lakeDir).filter($"symbol" === sym)
        assert(q.count() === n, sym)
      }
    } finally SymbolPruning.clear()
  }

  test("a symbol with >10 sids converges (In→InSet rewrite does not defeat the guard)") {
    // OptimizeIn (same fixed-point batch) converts In to InSet above the
    // default inSetConversionThreshold of 10 — the idempotence guard must
    // still recognize the predicate or the batch never converges and the
    // query FAILS with errorOnExceed
    val wide = (1L to 12L).map(sid => (sid, "WIDE"))
      .toDF("security_id", "symbol")
    SymbolPruning.register(wide, lakeDir)
    SymbolPruning.install(spark)
    try {
      // lake has no WIDE rows; the point is that planning terminates
      val q = spark.read.parquet(lakeDir).filter($"symbol" === "WIDE")
      assert(q.count() === 0)
    } finally SymbolPruning.clear()
  }

  test("an unrelated table with symbol+security_id columns is NOT rewritten") {
    // registration is scoped to the lake path: a different relation whose
    // id space has nothing to do with the master must keep all its rows
    val other = java.nio.file.Files.createTempDirectory("graft_other").toString
    // here AAA lives under security_id 99 — the master's {1,7} would
    // wrongly prune everything if the rule fired
    Seq((99L, "AAA", 1.0), (98L, "BBB", 2.0))
      .toDF("security_id", "symbol", "px")
      .write.mode("overwrite").parquet(other)
    SymbolPruning.register(master, lakeDir)
    SymbolPruning.install(spark)
    try {
      val q = spark.read.parquet(other).filter($"symbol" === "AAA")
      assert(q.count() === 1) // untouched — would be 0 if mis-pruned
    } finally SymbolPruning.clear()
  }

  test("q62 scans exactly one of the 50 staged shards") {
    try {
      val q = graft.queries.ScaleQueries.q62SymbolPruning(spark, "/root/testdata/sf0.001")
      assert(scannedPartitions(q) === 1)
    } finally graft.plans.SymbolPruning.clear()
  }

  test("idempotent: rule does not stack a second IN predicate") {
    SymbolPruning.register(master, lakeDir)
    SymbolPruning.install(spark)
    SymbolPruning.install(spark) // double install is a no-op
    try {
      val q = spark.read.parquet(lakeDir)
        .filter($"symbol" === "SYM2" && $"security_id".isin(2L))
      assert(scannedPartitions(q) === 1)
      assert(q.count() === 100)
      assert(spark.experimental.extraOptimizations
        .count(_.isInstanceOf[SymbolPruningRule]) === 1)
    } finally SymbolPruning.clear()
  }
}
