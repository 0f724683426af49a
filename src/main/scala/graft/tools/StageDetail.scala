package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev utility: per-STAGE task metrics for a handful of registered
  * queries — stage name, task count, Σrun/Σcpu/Σgc, min/max task run —
  * to localize run≫cpu blocking. Session conf mirrors [[graft.Bench]].
  * Not part of the driver contract.
  */
object StageDetail {

  private class PerStage extends SparkListener {
    case class S(var tasks: Int = 0, var run: Long = 0, var cpu: Long = 0,
      var gc: Long = 0, var maxRun: Long = 0, var name: String = "",
      var shRead: Long = 0, var shWrite: Long = 0, var fetchWait: Long = 0,
      var spill: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, S]()
    def reset(): Unit = stages.clear()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val s = stages.computeIfAbsent(t.stageId, _ => S())
      s.tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        s.run += m.executorRunTime
        s.cpu += m.executorCpuTime / 1000000
        s.gc += m.jvmGCTime
        s.maxRun = math.max(s.maxRun, m.executorRunTime)
        s.shRead += m.shuffleReadMetrics.totalBytesRead
        s.shWrite += m.shuffleWriteMetrics.bytesWritten
        s.fetchWait += m.shuffleReadMetrics.fetchWaitTime
        s.spill += m.diskBytesSpilled
      }
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val s = stages.computeIfAbsent(sc.stageInfo.stageId, _ => S())
      s.name = sc.stageInfo.name.takeWhile(_ != '\n').take(60)
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
    val agg = new PerStage
    spark.sparkContext.addSparkListener(agg)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("orders", "lineitem", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      graft.queries.MediaFixtures.prebuild(spark, sfDir)
    } catch { case _: Throwable => }
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    // in-process stack sampler over executor task threads (external jstack
    // attach is racy against short runs): aggregates the top interesting
    // frame per sample so blocked-in-what is visible without the UI
    val sampling = sys.env.get("SPARK_GRAFT_SAMPLE").contains("1")
    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var keepSampling = true
    val sampler = new Thread(() => {
      while (keepSampling) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (th, stack) =>
          if (th.getName.startsWith("Executor task launch") && stack.nonEmpty) {
            val top = stack.take(6).map(_.toString).mkString(" <- ")
            frames.merge(s"${th.getState}: $top", 1, (a, b) => a + b)
          }
        }
        Thread.sleep(150)
      }
    })
    sampler.setDaemon(true)
    if (sampling) sampler.start()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (t <- 1 to trials) {
        Thread.sleep(150)
        agg.reset()
        if (t == trials) frames.clear()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"[fail] $name: $e") }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        if (t == trials) { // print the warm trial only
          println(f"== $name trial=$t wall=$wall%.3f ==")
          import scala.jdk.CollectionConverters._
          agg.stages.asScala.toSeq.sortBy(-_._2.run).take(30).foreach {
            case (id, s) =>
              println(f"  stage=$id%4d tasks=${s.tasks}%4d run=${s.run / 1e3}%8.2f " +
                f"cpu=${s.cpu / 1e3}%8.2f gc=${s.gc / 1e3}%6.2f maxTask=${s.maxRun / 1e3}%6.2f " +
                f"shR=${s.shRead / 1e6}%7.1fMB shW=${s.shWrite / 1e6}%7.1fMB " +
                f"fw=${s.fetchWait / 1e3}%5.2f spill=${s.spill / 1e6}%6.1fMB ${s.name}")
          }
          if (sampling) {
            import scala.jdk.CollectionConverters._
            println("  -- sampled executor frames (count: state top-frames) --")
            frames.asScala.toSeq.sortBy(-_._2.intValue).take(12).foreach {
              case (k, n) => println(f"  $n%5d  ${k.take(340)}")
            }
          }
        }
        spark.catalog.clearCache()
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
