package graft.sql

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLake(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_cat").toString
    val bars = (0 until 400).map { i =>
      (9000L + i % 2, java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1)
        .plusDays(i / 2)), i.toLong, 2023 + (i / 2) / 365)
    }.toDF("security_id", "date", "close_cents", "year")
    graft.lake.Lake.overwritePartitions(bars, root, "daily_ticks",
      Seq("security_id", "year"))
    root
  }

  test("catalog identifiers resolve to lake tables; SQL reads match direct scans") {
    val root = freshLake()
    GraftCatalog.install(spark, "graftt", root)
    val viaSql = spark.sql("SELECT count(*) AS n FROM graftt.daily_ticks")
      .as[Long].head()
    val direct = spark.read.parquet(s"$root/daily_ticks").count()
    assert(viaSql === direct && direct === 400L)
    // SHOW TABLES walks the root listing
    val listed = spark.sql("SHOW TABLES IN graftt").select("tableName")
      .as[String].collect().toSet
    assert(listed === Set("daily_ticks"))
  }

  test("static partition filters prune the V2 scan to the matching directories") {
    val root = freshLake()
    GraftCatalog.install(spark, "graftt", root)
    val df = spark.sql(
      "SELECT close_cents FROM graftt.daily_ticks WHERE year = 2023 AND security_id = 9000")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val pScan = scans.head.asInstanceOf[ParquetScan]
    assert(pScan.partitionFilters.nonEmpty,
      "year/security_id predicates must reach the scan as partition filters")
    // the pruned file set (listing under the scan's own partition filters)
    // lives entirely under the one (sid, year) branch
    val files = pScan.fileIndex
      .listFiles(pScan.partitionFilters, pScan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.forall(f =>
      f.contains("security_id=9000") && f.contains("year=2023")), files.mkString("\n"))
    assert(files.size < pScan.fileIndex.inputFiles.length,
      "pruning must drop the other sid/year directories")
    assert(df.count() === spark.read.parquet(s"$root/daily_ticks")
      .filter($"year" === 2023 && $"security_id" === 9000).count())
  }

  test("root is re-pointable without a new session (catalog instances are cached)") {
    val root1 = freshLake()
    val root2 = java.nio.file.Files.createTempDirectory("graft_cat2").toString
    graft.lake.Lake.overwritePartitions(
      Seq((1L, 7L)).toDF("security_id", "close_cents"), root2, "daily_ticks", Seq.empty)
    GraftCatalog.install(spark, "graftt", root1)
    assert(spark.sql("SELECT count(*) AS n FROM graftt.daily_ticks").as[Long].head() === 400L)
    GraftCatalog.install(spark, "graftt", root2) // same name, new root
    assert(spark.sql("SELECT count(*) AS n FROM graftt.daily_ticks").as[Long].head() === 1L)
  }

  test("missing tables and DDL fail loudly; catalog is read-only") {
    val root = freshLake()
    GraftCatalog.install(spark, "graftt", root)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graftt.no_such_table").collect()
    }
    val ex = intercept[Exception] {
      spark.sql("DROP TABLE graftt.daily_ticks")
    }
    assert(ex.getMessage.contains("read-only") ||
      Option(ex.getCause).exists(_.getMessage.contains("read-only")), ex.toString)
  }
}
