package graft.fundamental

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EdgarFactsSpec extends SparkTestBase {
  import spark.implicits._

  // companyfacts-shaped JSON with a deprecated-tag transition: 2017 revenue
  // under SalesRevenueNet, 2018 under Revenues, one datapoint duplicated
  // under both tags (same accn/frame/filed).
  private val json =
    """{"cik": 320193, "entityName": "TestCo", "facts": {"us-gaap": {
      |  "Revenues": {"label": "Revenues", "description": "d", "units": {"USD": [
      |    {"val": 200.0, "accn": "a2", "fy": 2018, "fp": "FY", "form": "10-K",
      |     "filed": "2019-02-01", "frame": "CY2018", "start": "2018-01-01", "end": "2018-12-31"},
      |    {"val": 100.0, "accn": "a1", "fy": 2017, "fp": "FY", "form": "10-K",
      |     "filed": "2018-02-01", "frame": "CY2017", "start": "2017-01-01", "end": "2017-12-31"}]}},
      |  "SalesRevenueNet": {"label": "Sales", "description": "d", "units": {"USD": [
      |    {"val": 100.0, "accn": "a1", "fy": 2017, "fp": "FY", "form": "10-K",
      |     "filed": "2018-02-01", "frame": "CY2017", "start": "2017-01-01", "end": "2017-12-31"}]}},
      |  "Assets": {"label": "Assets", "description": "d", "units": {"USD": [
      |    {"val": 999.0, "accn": "a2", "fy": 2018, "fp": "FY", "form": "10-K",
      |     "filed": "2019-02-01", "frame": "CY2018I", "start": null, "end": "2018-12-31"}]}},
      |  "UnmappedTag": {"label": "x", "description": "d", "units": {"USD": [
      |    {"val": 1.0, "accn": "a9", "fy": 2018, "fp": "FY", "form": "10-K",
      |     "filed": "2019-02-01", "frame": "CY2018", "start": null, "end": "2018-12-31"}]}}
      |}}}""".stripMargin

  private lazy val out = EdgarFacts.parse(Seq(json).toDF("body"), "body").cache()

  test("merges candidate tags and dedups (accn, frame, filed) duplicates") {
    val rev = out.filter($"concept" === "rev").orderBy("filed").collect()
    assert(rev.length === 2) // the duplicated 2017 point appears once
    assert(rev.map(_.getAs[Double]("value")).toSeq === Seq(100.0, 200.0))
  }

  test("cik zero-padded to 10 digits; unmapped tags dropped") {
    assert(out.select("cik").distinct().as[String].head() === "0000320193")
    assert(out.filter($"value" === 1.0).count() === 0)
  }

  test("instant concepts carry null start and typed dates") {
    val ta = out.filter($"concept" === "ta").collect().head
    assert(ta.isNullAt(ta.fieldIndex("start")))
    assert(ta.getAs[java.sql.Date]("end").toString === "2018-12-31")
    assert(ta.getAs[java.sql.Date]("filed").toString === "2019-02-01")
  }

  test("malformed JSON yields no rows, not an error") {
    assert(EdgarFacts.parse(Seq("not json at all").toDF("body"), "body").count() === 0)
  }
}
