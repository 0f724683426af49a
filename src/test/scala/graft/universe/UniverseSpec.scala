package graft.universe

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UniverseSpec extends SparkTestBase {
  import spark.implicits._

  test("common-stock predicate excludes funds/ETFs/trusts/preferreds") {
    val names = Seq(
      ("Apple Inc", true),
      ("SPDR S&P 500 ETF", false),
      ("Vanguard Total Market Fund", false),
      ("XYZ Capital Trust", false),
      ("ABC 5.25% Preferred", false),
      ("Brookfield Renewable LP", false),
      ("Plain Industrials Corp", true))
    val got = names.map(_._1).toDF("name")
      .withColumn("ok", Universe.isCommonStock($"name"))
      .as[(String, Boolean)].collect().toMap
    names.foreach { case (n, exp) => assert(got(n) === exp, n) }
  }

  test("topByDollarVolume ranks by mean close*volume above threshold") {
    val bars = Seq(
      ("AAA", 10.0, 1000L), ("AAA", 10.0, 3000L), // adv = 20000
      ("BBB", 5.0, 100000L),                      // adv = 500000
      ("TINY", 1.0, 10L))                         // adv = 10 < 1000 → excluded
      .toDF("symbol", "close", "volume")
    val got = Universe.topByDollarVolume(bars, k = 10)
      .select("symbol").as[String].collect()
    assert(got.toSeq === Seq("BBB", "AAA"))
  }
}
