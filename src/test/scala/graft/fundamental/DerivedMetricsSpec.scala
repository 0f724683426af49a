package graft.fundamental

import graft.SparkTestBase
import java.sql.Date

class DerivedMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def longRow(aod: String, concept: String, v: java.lang.Double) =
    ("AAPL", d(aod), concept, v)

  test("gross margin 40000/100000 = 0.4 (reference test_metrics.py:103-130)") {
    val ttm = Seq(
      longRow("2024-03-31", "rev", 100000.0),
      longRow("2024-03-31", "cor", 60000.0))
      .toDF("symbol", "as_of_date", "concept", "value")
    val out = DerivedMetrics.compute(ttm)
      .filter($"metric".isin("grs_pft", "grs_mgn"))
      .collect().map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(out("grs_pft") === 40000.0)
    assert(out("grs_mgn") === 0.4)
  }

  test("safe divide: zero or null denominator yields no metric row") {
    val ttm = Seq(
      longRow("2024-03-31", "rev", 0.0),
      longRow("2024-03-31", "net_inc", 10.0))
      .toDF("symbol", "as_of_date", "concept", "value")
    val out = DerivedMetrics.compute(ttm)
    assert(out.filter($"metric" === "net_mgn").count() === 0)
  }

  test("avg_ast uses lag-4 (YoY on quarterly rows); roa = net_inc/avg_ast") {
    val rows = (1 to 5).flatMap { q =>
      val aod = f"202${4 + (q - 1) / 4}%d-${Seq("03-31", "06-30", "09-30", "12-31")((q - 1) % 4)}%s"
      Seq(longRow(aod, "ta", 100.0 * q), longRow(aod, "net_inc", 10.0))
    }.toDF("symbol", "as_of_date", "concept", "value")
    val wide = DerivedMetrics.computeWide(
      DerivedMetrics.requiredInputs.foldLeft(DerivedMetrics.pivotWide(rows)) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, org.apache.spark.sql.functions.lit(null).cast("double"))
      })
    val r5 = wide.orderBy($"as_of_date").collect().last
    // avg_ast at row 5 = (500 + 100)/2 = 300; roa = 10/300
    assert(r5.getAs[Double]("avg_ast") === 300.0)
    assert(math.abs(r5.getAs[Double]("roa") - 10.0 / 300.0) < 1e-12)
    // first 4 rows: lag-4 is null -> avg_ast null -> no roa
    assert(wide.filter($"avg_ast".isNotNull).count() === 1)
  }

  test("rev_grw is plain lag-1 difference; first row null") {
    val ttm = Seq(
      longRow("2024-03-31", "rev", 100.0),
      longRow("2024-06-30", "rev", 130.0))
      .toDF("symbol", "as_of_date", "concept", "value")
    val out = DerivedMetrics.compute(ttm).filter($"metric" === "rev_grw").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("value") === 30.0)
    assert(out.head.getAs[Date]("as_of_date") === d("2024-06-30"))
  }

  test("all 24 metrics emitted when all inputs present") {
    val concepts = DerivedMetrics.requiredInputs
    val rows = (1 to 5).flatMap { i =>
      val aod = Seq("2023-03-31", "2023-06-30", "2023-09-30", "2023-12-31", "2024-03-31")(i - 1)
      concepts.map(c => longRow(aod, c, 100.0 + i))
    }.toDF("symbol", "as_of_date", "concept", "value")
    val metrics = DerivedMetrics.compute(rows)
      .select("metric").distinct().as[String].collect().toSet
    assert(metrics === DerivedMetrics.metricNames.toSet)
  }
}
