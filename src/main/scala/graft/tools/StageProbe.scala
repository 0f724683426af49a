package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev utility (guide §1/§7): per registered query, aggregate task-level
  * metrics across every job the query triggers — task count, executor
  * run/CPU/GC time, shuffle bytes, fetch wait — next to the wall time.
  * `wall × cores − Σ run` is the idle/scheduling gap: a large gap with few
  * tasks means serialized job chains; Σ run ≫ Σ cpu means I/O or GC; many
  * tiny tasks with run ≈ overhead means width is too fine for the data.
  * Session conf mirrors [[graft.Bench]]. Not part of the driver contract.
  */
object StageProbe {

  private class Agg extends SparkListener {
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val run = new java.util.concurrent.atomic.AtomicLong(0) // ms
    val cpu = new java.util.concurrent.atomic.AtomicLong(0) // ns
    val gc = new java.util.concurrent.atomic.AtomicLong(0) // ms
    val deser = new java.util.concurrent.atomic.AtomicLong(0) // ms
    val resSer = new java.util.concurrent.atomic.AtomicLong(0) // ms
    val shRead = new java.util.concurrent.atomic.AtomicLong(0)
    val shWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val fetchWait = new java.util.concurrent.atomic.AtomicLong(0) // ms
    def reset(): Unit = Seq(tasks, jobs, stages, run, cpu, gc, deser,
      resSer, shRead, shWrite, fetchWait).foreach(_.set(0))
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        run.addAndGet(m.executorRunTime)
        cpu.addAndGet(m.executorCpuTime)
        gc.addAndGet(m.jvmGCTime)
        deser.addAndGet(m.executorDeserializeTime)
        resSer.addAndGet(m.resultSerializationTime)
        shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        fetchWait.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
      }
    }
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
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      graft.queries.Tables.events(spark, sfDir).count()
      graft.queries.MediaFixtures.prebuild(spark, sfDir)
    } catch { case _: Throwable => }
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    case class Row(wall: Double, line: String)
    val best = scala.collection.mutable.Map.empty[String, Row]
    val nCores = cpus.toInt
    for (t <- 1 to trials; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // let the async listener bus drain the previous query's events
      Thread.sleep(120)
      agg.reset()
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120)
      val runS = agg.run.get / 1e3
      val line = f"[stage] $name%-28s wall=$wall%7.3f jobs=${agg.jobs.get}%3d " +
        f"stages=${agg.stages.get}%4d tasks=${agg.tasks.get}%5d " +
        f"run=$runS%8.2f cpu=${agg.cpu.get / 1e9}%8.2f gc=${agg.gc.get / 1e3}%6.2f " +
        f"deser=${agg.deser.get / 1e3}%6.2f idle%%=${100 * (1 - runS / (wall * nCores))}%5.1f " +
        f"shR=${agg.shRead.get / 1e6}%8.1fMB shW=${agg.shWrite.get / 1e6}%8.1fMB " +
        f"fwait=${agg.fetchWait.get / 1e3}%6.2f"
      if (ok && (!best.contains(name) || best(name).wall > wall))
        best(name) = Row(wall, line)
      spark.catalog.clearCache()
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    names.foreach(n => best.get(n).foreach(r => println(r.line)))
    println(f"[stage:total] wall=${best.values.map(_.wall).sum}%.2f")
    spark.stop()
  }
}
