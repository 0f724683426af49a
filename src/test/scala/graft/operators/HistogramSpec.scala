package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Equal-width histogram sketch: bins, folding, quantile inversion. */
class HistogramSpec extends SparkTestBase {
  import spark.implicits._

  test("bin assignment and edge clamping") {
    val df = Seq(-5L, 0L, 99L, 100L, 950L, 1000L, 4000L).toDF("v")
    val h = Histogram.build(df, Seq.empty, "v", lo = 0L, binWidth = 100L,
      bins = 10).as[(Long, Long)].collect().toMap
    assert(h(0L) === 3L) // -5 clamps in, 0 and 99 belong
    assert(h(1L) === 1L) // 100
    assert(h(9L) === 3L) // 950 + clamped 1000 and 4000
  }

  test("histograms fold by summing counts: fold == whole-build") {
    val a = spark.range(0, 600).select(col("id").as("v"))
    val b = spark.range(600, 1000).select(col("id").as("v"))
    val whole = Histogram.build(spark.range(0, 1000).select(col("id").as("v")),
      Seq.empty, "v", 0L, 100L, 10).as[(Long, Long)].collect().toMap
    val folded = Histogram.build(a, Seq.empty, "v", 0L, 100L, 10)
      .unionByName(Histogram.build(b, Seq.empty, "v", 0L, 100L, 10))
      .groupBy("bin").agg(sum("n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(folded === whole)
  }

  test("quantile inversion on a uniform distribution is exact") {
    val h = Histogram.build(spark.range(0, 1000).select(col("id").as("v")),
      Seq.empty, "v", 0L, 100L, 10)
    val q = Histogram.quantileMicro(h, Seq.empty, 0L, 100L,
      Seq(0.25, 0.5, 0.99)).as[(Double, Long)].collect().toMap
    assert(q(0.25) === 250000000L) // 100*(2 + 0.5) = 250
    assert(q(0.5) === 500000000L)
    assert(q(0.99) === 990000000L)
  }

  test("per-group quantiles with skewed mass land in the right bin") {
    val df = (Seq.fill(90)(10L) ++ Seq.fill(10)(950L)).map(("g", _))
      .toDF("g", "v")
    val h = Histogram.build(df, Seq("g"), "v", 0L, 100L, 10)
    val q = Histogram.quantileMicro(h, Seq("g"), 0L, 100L, Seq(0.5, 0.95))
      .as[(String, Double, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    // t=50 inside bin 0 (n=90): est = 100*(0 + 50/90)
    assert(q(0.5) === math.round(100.0 * (50.0 / 90.0) * 1e6))
    // t=95 -> bin 9: before=90, frac=5/10 -> 100*(9+0.5)=950
    assert(q(0.95) === 950000000L)
  }
}
