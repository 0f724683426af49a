package graft.streaming

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** [[Incremental.upsertToTable]] — the update-mode streaming sink for
  * versioned tables: a windowed/grouped aggregation stream MERGEs each
  * micro-batch into the table (matched keys update, new keys insert),
  * exactly-once across a checkpointed restart.
  */
class UpsertToTableSpec extends SparkTestBase {
  import spark.implicits._

  test("a grouped aggregation stream lands as MERGE upserts, a restart " +
      "consumes only new data, and the final table equals the batch " +
      "recomputation") {
    val root = java.nio.file.Files.createTempDirectory("upsert_tbl").toString
    val src = s"$root/_src"; val cp = s"$root/_cp"
    val srcSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    Snapshots.createTable(spark, root, "agg", StructType(Seq(
      StructField("k", LongType),
      StructField("n", LongType), StructField("sum_v", LongType))))
    graft.sql.GraftCatalog.install(spark, "gup", root)

    def stream = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))

    // run 1: two files → two micro-batches of UPDATED aggregate rows
    Seq((0L, 1L), (1L, 10L), (2L, 100L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((0L, 2L), (3L, 1000L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Incremental.upsertToTable(stream, "gup.agg", Seq("k"), cp)
    val after1 = spark.sql("SELECT k, n, sum_v FROM gup.agg")
      .as[(Long, Long, Long)].collect().toSet
    assert(after1 === Set((0L, 2L, 3L), (1L, 1L, 10L), (2L, 1L, 100L),
      (3L, 1L, 1000L)))

    // restart with one new file: only it is consumed; existing keys update
    val before = Snapshots.latestVersion(spark, root, "agg").get
    Seq((0L, 4L), (4L, 7L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    Incremental.upsertToTable(stream, "gup.agg", Seq("k"), cp)
    val after2 = spark.sql("SELECT k, n, sum_v FROM gup.agg")
      .as[(Long, Long, Long)].collect().toSet
    val expect = Seq((0L, 1L), (1L, 10L), (2L, 100L), (0L, 2L),
      (3L, 1000L), (0L, 4L), (4L, 7L))
      .groupBy(_._1).map { case (k, vs) =>
        (k, vs.size.toLong, vs.map(_._2).sum) }.toSet
    assert(after2 === expect)
    // the restart merged, it did not re-ingest run 1's batches
    assert(Snapshots.latestVersion(spark, root, "agg").get > before)

    // idle re-run: nothing new, no version published
    val v = Snapshots.latestVersion(spark, root, "agg").get
    Incremental.upsertToTable(stream, "gup.agg", Seq("k"), cp)
    assert(Snapshots.latestVersion(spark, root, "agg").get === v)
  }
}
