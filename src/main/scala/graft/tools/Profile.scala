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
        case q =>
          (1 to 3).foreach { i =>
            time(s"$q run$i") { graft.SparkEntry.queries(q)(spark, sfDir).count() }
          }
      }
    }
    spark.stop()
  }
}
