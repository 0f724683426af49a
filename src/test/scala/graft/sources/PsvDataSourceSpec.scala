package graft.sources

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PsvDataSourceSpec extends SparkTestBase {

  private def writePsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("psv_spec")
    Files.write(dir.resolve("part-0.psv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("infers header schema and reads rows as strings") {
    val dir = writePsv(Seq(
      "Symbol|Security Name|ETF",
      "AAPL|Apple Inc.|N",
      "SPY|SPDR S&P 500|Y",
      "QQQ|Invesco QQQ|Y"))
    val df = spark.read.format("graft.sources.PsvDataSource").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("Symbol", "Security Name", "ETF"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 3)
  }

  test("pushes EqualTo filter and prunes columns into the scan") {
    val dir = writePsv(Seq(
      "Symbol|Security Name|ETF",
      "AAPL|Apple Inc.|N",
      "SPY|SPDR S&P 500|Y"))
    val df = spark.read.format("graft.sources.PsvDataSource").load(dir)
      .filter(col("ETF") === "Y")
      .select("Symbol")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PsvScan"), plan)
    // Pushed filter reaches the scan description.
    assert(plan.contains("EqualTo(ETF,Y)"), plan)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("SPY"))
    // Pruned read schema: only the columns the query needs.
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(!scan.schema.fieldNames.contains("Security Name"), scan.schema)
  }

  test("short rows pad with empty strings; multiple files become partitions") {
    val dir = Files.createTempDirectory("psv_spec_multi")
    Files.write(dir.resolve("a.psv"),
      "k|v\n1|x\n2".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.psv"),
      "k|v\n3|z".getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("graft.sources.PsvDataSource").load(dir.toString)
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("1", "x"), ("2", ""), ("3", "z")))
  }
}
