package graft.lake

import graft.SparkTestBase
import java.nio.file.Files

class FooterMetadataSpec extends SparkTestBase {
  import spark.implicits._

  test("export embeds the four reference fields in the file's own footer") {
    val dir = Files.createTempDirectory("graft-footer").toString
    val path = s"$dir/master_export.parquet"
    val master = Seq((1L, "AAPL", "2024-12-31"), (2L, "MSFT", "2024-12-31"))
      .toDF("security_id", "symbol", "end_date")
    val written = FooterMetadata.exportWithMetadata(master, path,
      crspEndDate = "2024-12-31", exportTimestamp = "2025-01-02T03:04:05")

    // any parquet client sees the metadata — read straight from the footer
    val kv = FooterMetadata.read(path, spark.sparkContext.hadoopConfiguration)
    assert(kv("crsp_end_date") === "2024-12-31")
    assert(kv("export_timestamp") === "2025-01-02T03:04:05")
    assert(kv("version") === "1.0")
    assert(kv("row_count") === "2")
    assert(written("row_count") === "2")
    // Spark's own schema entry survived the footer rewrite → still a
    // first-class Spark table
    assert(kv.contains("org.apache.spark.sql.parquet.row.metadata"))

    val (df, meta) = FooterMetadata.loadWithMetadata(spark, path)
    assert(df.orderBy("security_id").collect().map(_.getString(1)).toSeq ===
      Seq("AAPL", "MSFT"))
    assert(meta("crsp_end_date") === "2024-12-31")
  }

  test("embed merges with existing keys; new keys win; data bytes unchanged") {
    val dir = Files.createTempDirectory("graft-footer2").toString
    val path = s"$dir/t.parquet"
    FooterMetadata.exportWithMetadata(
      (1L to 100L).toDF("v"), path, "2024-01-31", "ts1")
    val conf = spark.sparkContext.hadoopConfiguration
    FooterMetadata.embed(path, Map("version" -> "2.0", "note" -> "patched"), conf)
    val kv = FooterMetadata.read(path, conf)
    assert(kv("version") === "2.0")   // overwritten
    assert(kv("note") === "patched")  // added
    assert(kv("crsp_end_date") === "2024-01-31") // preserved
    assert(spark.read.parquet(path).count() === 100L)
  }
}
