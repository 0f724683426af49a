package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one registered query (or a named sub-stage) at a given
  * SF dir, printing per-phase wall times. Not part of the driver contract.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... runMain graft.tools.Profile q26_ngram_jaccard }}}
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    args.foreach { name =>
      name match {
        case "stages:scan" =>
          import org.apache.spark.sql.functions._
          val docs = graft.queries.Tables.documents(spark, sfDir)
          time("scan text only") { docs.select(length(col("text"))).agg(sum("length(text)")).count() }
          time("scan text again") { docs.select(length(col("text"))).agg(sum("length(text)")).count() }
          val toks = graft.text.TextFunctions.tokens(col("text"))
          time("tokenize+count") { docs.select(size(toks).as("n")).agg(sum("n")).count() }
          time("tokenize again") { docs.select(size(toks).as("n")).agg(sum("n")).count() }
          time("shingle-hash explode") {
            graft.operators.Dedup.hashedShinglePairs(docs, "text", "doc_id", 3).count()
          }
          time("shingle-hash again") {
            graft.operators.Dedup.hashedShinglePairs(docs, "text", "doc_id", 3).count()
          }
        case "stages:q44" =>
          import org.apache.spark.sql.functions._
          val ev = graft.queries.Tables.events(spark, sfDir)
            .select(col("event_id"),
              timestamp_micros((col("ts_ns") / 1000).cast("long")).as("ts"),
              col("user_id"), col("event_type"), col("value"))
          time("stage write") {
            ev.write.mode("overwrite").parquet("/tmp/graft_stream_events_prof"); 0L
          }
          time("stream run") {
            val stream = graft.streaming.Incremental.fileStream(
              spark, "/tmp/graft_stream_events_prof", ev.schema)
            val deduped = graft.streaming.Incremental.dedupAppend(stream, "ts", "event_id", "1 day")
            val windowed = graft.streaming.Incremental.windowedCounts(
              deduped, "ts", "1 hour", watermark = None, Seq("event_type"))
            graft.streaming.Incremental.runAvailableNow(windowed, "graft_prof_out", outputMode = "complete")
            spark.table("graft_prof_out").count()
          }
        case "stages:q45" =>
          import org.apache.spark.sql.functions._
          time("deriveMaster") {
            graft.queries.MasterQueries.deriveMaster(spark, sfDir).count()
          }
          val master = graft.queries.MasterQueries.deriveMaster(spark, sfDir).cache()
          time("master cache") { master.count() }
          val probes = graft.queries.Tables.orders(spark, sfDir)
            .join(graft.queries.Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("c_name").as("symbol"),
              col("o_orderdate").cast("date").as("day"))
          time("probes") { probes.count() }
          time("resolveExact") {
            graft.master.SecurityMaster.resolveExact(probes, master).count()
          }
          time("resolve full") {
            graft.master.SecurityMaster.resolve(probes, master).count()
          }
          time("resolve full again") {
            graft.master.SecurityMaster.resolve(probes, master).count()
          }
        case "stages:q26" =>
          import org.apache.spark.sql.functions._
          val docs = graft.queries.Tables.documents(spark, sfDir)
          time("tokens+shingles+explode") {
            graft.operators.Dedup.hashedShinglePairs(docs, "text", "doc_id", 3).count()
          }
          val pairs = graft.operators.Dedup
            .hashedShinglePairs(docs, "text", "doc_id", 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          time("pairs materialize") { pairs.count() }
          val a = pairs.select(col("sh"), col("id").as("id_a"))
          val b = pairs.select(col("sh"), col("id").as("id_b"))
          time("self-join+filter") { a.join(b, Seq("sh")).filter(col("id_a") < col("id_b")).count() }
          time("join+groupBy") {
            a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
              .groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count()
          }
          time("full q26") {
            graft.queries.TextQueries.q26NgramJaccard(spark, sfDir).count()
          }
          time("full q26 again") {
            graft.queries.TextQueries.q26NgramJaccard(spark, sfDir).count()
          }
        case "stages:topk" =>
          import org.apache.spark.sql.functions._
          import org.apache.spark.sql.expressions.Window
          val o = graft.queries.Tables.orders(spark, sfDir)
            .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          val w = Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          (1 to 3).foreach { i =>
            time(s"window row_number run$i") {
              o.withColumn("rn", row_number().over(w))
                .filter(col("rn") <= 3).drop("rn").count()
            }
            time(s"TopKPerKey run$i") {
              graft.plans.TopKPerKey(o, 3, Seq("o_custkey"),
                Seq(("o_totalprice", false), ("o_orderkey", true))).count()
            }
          }
        case q =>
          (1 to 3).foreach { i =>
            time(s"$q run$i") { graft.SparkEntry.queries(q)(spark, sfDir).count() }
          }
      }
    }
    spark.stop()
  }
}
