package graft.fundamental

import graft.SparkTestBase
import java.sql.Date

class Q4DerivationSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def row(concept: String, v: Double, start: String, end: String,
      filed: String, frame: String, accn: String = "a1") =
    ("AAPL", concept, v, d(start), d(end), d(filed), frame, accn)

  private val cols = Seq("symbol", "concept", "value", "start", "end", "filed", "frame", "accn")

  test("Q4 = FY − Q1 − Q2 − Q3; start = Q3.end + 1 day") {
    val df = Seq(
      row("rev", 100.0, "2024-01-01", "2024-03-31", "2024-05-01", "CY2024Q1"),
      row("rev", 110.0, "2024-04-01", "2024-06-30", "2024-08-01", "CY2024Q2"),
      row("rev", 120.0, "2024-07-01", "2024-09-30", "2024-11-01", "CY2024Q3"),
      row("rev", 400.0, "2024-01-01", "2024-12-31", "2025-02-01", "CY2024"))
      .toDF(cols: _*)
    val out = Q4Derivation.normalize(df)
    assert(out.count() === 4)
    val q4 = out.filter($"frame" === "CY2024").collect().head
    assert(q4.getAs[Double]("value") === 70.0)
    assert(q4.getAs[Date]("start") === d("2024-10-01"))
    assert(q4.getAs[Date]("end") === d("2024-12-31"))
  }

  test("annual without all three quarters emits no Q4") {
    val df = Seq(
      row("rev", 100.0, "2024-01-01", "2024-03-31", "2024-05-01", "CY2024Q1"),
      row("rev", 400.0, "2024-01-01", "2024-12-31", "2025-02-01", "CY2024"))
      .toDF(cols: _*)
    val out = Q4Derivation.normalize(df)
    assert(out.count() === 1) // only the standalone Q1 passes through
  }

  test("latest-filed wins per frame (amended filing)") {
    val df = Seq(
      row("rev", 100.0, "2024-01-01", "2024-03-31", "2024-05-01", "CY2024Q1", "orig"),
      row("rev", 105.0, "2024-01-01", "2024-03-31", "2024-07-01", "CY2024Q1", "amend"))
      .toDF(cols: _*)
    val out = Q4Derivation.normalize(df).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("value") === 105.0)
  }

  test("frame-suffix fallback: Q1I picked when exact Q1 frame absent") {
    val df = Seq(
      row("rev", 100.0, "2024-01-01", "2024-03-31", "2024-05-01", "CY2024Q1I"),
      row("rev", 110.0, "2024-04-01", "2024-06-30", "2024-08-01", "CY2024Q2"),
      row("rev", 120.0, "2024-07-01", "2024-09-30", "2024-11-01", "CY2024Q3"),
      row("rev", 400.0, "2024-01-01", "2024-12-31", "2025-02-01", "CY2024"))
      .toDF(cols: _*)
    val q4 = Q4Derivation.normalize(df).filter($"frame" === "CY2024").collect()
    assert(q4.length === 1 && q4.head.getAs[Double]("value") === 70.0)
  }

  test("rows missing filed/frame/start/end are dropped") {
    val df = Seq(
      ("AAPL", "rev", 1.0, null.asInstanceOf[Date], d("2024-03-31"), d("2024-05-01"), "CY2024Q1", "a"))
      .toDF(cols: _*)
    assert(Q4Derivation.normalize(df).count() === 0)
  }
}
