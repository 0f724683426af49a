package graft.fundamental

import graft.SparkTestBase
import java.sql.Date

class TtmSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // Mirrors reference tests/unit/derived/test_ttm.py:32-57.
  private def quarters(vals: Seq[Double]) = {
    val qs = Seq(
      ("2024-03-31", "acc1", "10-Q", "2024-01-01", "2024-03-31", "CY2024Q1"),
      ("2024-06-30", "acc2", "10-Q", "2024-04-01", "2024-06-30", "CY2024Q2"),
      ("2024-09-30", "acc3", "10-Q", "2024-07-01", "2024-09-30", "CY2024Q3"),
      ("2024-12-31", "acc4", "10-K", "2024-10-01", "2024-12-31", "CY2024Q4"))
    qs.zip(vals).map { case ((aod, accn, form, st, en, fr), v) =>
      ("AAPL", d(aod), accn, form, "rev", v, d(st), d(en), fr)
    }.toDF("symbol", "as_of_date", "accn", "form", "concept", "value", "start", "end", "frame")
  }

  test("TTM of 4 quarters 100+110+120+130 = 460, start/end span the year") {
    val out = Ttm.compute(quarters(Seq(100.0, 110.0, 120.0, 130.0))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("value") === 460.0)
    assert(r.getAs[Date]("as_of_date") === d("2024-12-31"))
    assert(r.getAs[Date]("start") === d("2024-01-01"))
    assert(r.getAs[Date]("end") === d("2024-12-31"))
    assert(r.getAs[String]("accn") === "acc4")
    assert(r.getAs[String]("form") === "10-K")
    assert(r.getAs[String]("frame") === "CY2024Q4")
  }

  test("fewer than 4 rows yields no TTM") {
    assert(Ttm.compute(quarters(Seq(1.0, 2.0, 3.0, 4.0)).limit(3)).count() === 0)
  }

  test("instant concepts are excluded from the rollup") {
    val df = quarters(Seq(1.0, 2.0, 3.0, 4.0))
      .withColumn("concept", org.apache.spark.sql.functions.lit("ta"))
    assert(Ttm.compute(df).count() === 0)
  }

  test("5 quarters roll to 2 windows") {
    val base = quarters(Seq(100.0, 110.0, 120.0, 130.0))
    val q5 = Seq(("AAPL", d("2025-03-31"), "acc5", "10-Q", "rev", 140.0,
      d("2025-01-01"), d("2025-03-31"), "CY2025Q1"))
      .toDF("symbol", "as_of_date", "accn", "form", "concept", "value", "start", "end", "frame")
    val out = Ttm.compute(base.unionByName(q5)).orderBy("as_of_date").collect()
    assert(out.map(_.getAs[Double]("value")).toSeq === Seq(460.0, 500.0))
    assert(out.last.getAs[Date]("start") === d("2024-04-01"))
  }
}
