package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** `writeStream.toTable` onto a table that does NOT exist yet: Spark
  * plans a CreateTable against the catalog (schema from the stream,
  * partitioning from `.partitionBy`), then starts the query against the
  * created table — the natural first-use flow of a streaming ingest.
  */
class StreamingCreateSpec extends SparkTestBase {
  import spark.implicits._

  test("toTable auto-provisions a missing versioned table (v1 = empty " +
      "manifest) and streams into it, partitioned via partitionBy") {
    val root = java.nio.file.Files.createTempDirectory("stream_create").toString
    GraftCatalog.install(spark, "graftsc", root)
    val src = s"$root/_src"; val cp = s"$root/_cp"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("p", LongType)))
    (0L until 20L).map(i => (i, i % 4)).toDF("id", "p")
      .coalesce(2).write.parquet(src)
    val q = spark.readStream.schema(schema).parquet(src)
      .writeStream
      .partitionBy("p")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .toTable("graftsc.fresh")
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM graftsc.fresh").as[Long].head() === 20L)
    // v1 = the CREATE's empty manifest, v2 = the epoch
    val hist = Snapshots.history(spark, root, "fresh")
      .select("version", "operation").as[(Long, String)].collect().toMap
    assert(hist.get(1L) === Some("create"), hist)
    assert(hist.get(2L) === Some("stream"), hist)
    // the declared layout drove the epoch's Hive directories
    assert(Snapshots.liveFiles(spark, root, "fresh", 2L)
      .forall(_.startsWith("p=")), Snapshots.liveFiles(spark, root, "fresh", 2L))
    assert(spark.sql("SELECT count(*) FROM graftsc.fresh WHERE p = 1")
      .as[Long].head() === 5L)
  }
}
