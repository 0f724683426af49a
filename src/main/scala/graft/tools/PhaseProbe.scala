package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev utility (guide §1: measure first): split a registered query's wall
  * time into driver-side planning (parsing/analysis/optimization/physical
  * planning, from the executed plan's QueryPlanningTracker) vs execution.
  * Session conf mirrors [[graft.Bench]] exactly so the numbers are
  * comparable to bench captures. Not part of the driver contract.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... runMain graft.tools.PhaseProbe q26_... q45_... }}}
  */
object PhaseProbe {

  /** Captures planning-phase durations of every query execution that
    * completes between reset() and read(). A query function may trigger
    * several executions (staging writes, streaming batches); we sum them.
    */
  private class PhaseListener extends QueryExecutionListener {
    val phases = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    var executions = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { phases.clear(); executions.set(0) }
    private def record(qe: QueryExecution): Unit = {
      executions.incrementAndGet()
      qe.tracker.phases.foreach { case (k, v) =>
        phases.merge(k, (v.endTimeMs - v.startTimeMs) / 1e3, (a, b) => a + b)
      }
    }
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = record(qe)
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = record(qe)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.hadoop.fs.file.impl",
        "graft.lake.NoForkLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.lake.NoForkLocalFs")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.local.dir", graft.LocalScratch.dir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new PhaseListener
    spark.listenerManager.register(listener)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      graft.queries.Tables.events(spark, sfDir).count()
      graft.queries.MediaFixtures.prebuild(spark, sfDir)
    } catch { case _: Throwable => }
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    case class Row(wall: Double, plan: Double, nExec: Int,
      phases: Map[String, Double])
    val best = scala.collection.mutable.Map.empty[String, Row]
    for (t <- 1 to trials; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      listener.reset()
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener callbacks are async — give them a beat to drain
      Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val ph = listener.phases.asScala.toMap
      val row = Row(wall, ph.values.sum, listener.executions.get(), ph)
      if (ok && (!best.contains(name) || best(name).wall > wall))
        best(name) = row
      println(f"[trial] $name t=$t ok=$ok wall=$wall%.3f plan=${row.plan}%.3f")
      spark.catalog.clearCache()
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    println(f"${"query"}%-30s ${"wall"}%8s ${"plan"}%8s ${"exec"}%8s ${"nq"}%4s  phases")
    names.foreach { n =>
      best.get(n).foreach { r =>
        val ph = r.phases.toSeq.sortBy(-_._2).take(4)
          .map { case (k, v) => f"$k=$v%.3f" }.mkString(" ")
        println(f"[phase] $n%-28s ${r.wall}%8.3f ${r.plan}%8.3f " +
          f"${r.wall - r.plan}%8.3f ${r.nExec}%4d  $ph")
      }
    }
    val tw = best.values.map(_.wall).sum
    val tp = best.values.map(_.plan).sum
    println(f"[phase:total] wall=$tw%.2f plan=$tp%.2f exec=${tw - tp}%.2f")
    spark.stop()
  }
}
