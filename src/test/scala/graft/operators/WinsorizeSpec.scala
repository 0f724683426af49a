package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Winsorization: bounds, clamping, interior values untouched. */
class WinsorizeSpec extends SparkTestBase {
  import spark.implicits._

  test("clips exactly at interpolated per-group quantiles") {
    // group a: 0..100 (101 values) -> p10 = 10, p90 = 90 exactly
    val df = (0L to 100L).map(("a", _)).toDF("g", "v")
    val out = Winsorize.clip(df, Seq("g"), "v", 0.10, 0.90)
    val m = out.select("v", "clipped_milli").as[(Long, Long)].collect().toMap
    assert(m(0L) === 100L) // clipped up to 10 -> milli 100
    assert(m(5L) === 100L)
    assert(m(10L) === 100L) // boundary stays
    assert(m(50L) === 500L) // interior untouched
    assert(m(95L) === 900L) // clipped down to 90
    assert(m(100L) === 900L)
  }

  test("interpolated (fractional) bounds survive the milli scaling") {
    // 1,2,3,4 -> p25 at (n-1)*0.25 = 0.75 -> 1 + 0.75*(2-1) = 1.75
    val df = Seq(1L, 2L, 3L, 4L).map(("a", _)).toDF("g", "v")
    val out = Winsorize.clip(df, Seq("g"), "v", 0.25, 0.75)
    val lo = out.select("lo_bound").distinct().as[Double].head()
    assert(lo === 1.75)
    val m = out.select("v", "clipped_milli").as[(Long, Long)].collect().toMap
    assert(m(1L) === 18L) // round(1.75*10)
    assert(m(4L) === 33L) // hi = 3.25 -> 33 (round-half-up)
  }

  test("groups clip independently") {
    val df = ((0L to 9L).map(("a", _)) ++ (100L to 109L).map(("b", _)))
      .toDF("g", "v")
    val out = Winsorize.clip(df, Seq("g"), "v", 0.0, 0.5)
    val hi = out.select("g", "hi_bound").distinct()
      .as[(String, Double)].collect().toMap
    assert(hi("a") === 4.5 && hi("b") === 104.5)
    // p0 lo bound = group min: nothing clips low
    assert(out.filter(col("v").cast("double") < col("lo_bound")).count() === 0)
  }
}
