package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Benford digit audit and HHI concentration vs hand math. */
class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("benford: digit extraction, absent digits, exp/dev arithmetic") {
    // 6 values: digits 1,1,2,9 (+ zero and negative dropped)
    val df = Seq(100L, 1999L, 23L, 900L, 0L, -5L).toDF("x")
    val got = DataQuality.benford(df, col("x"))
      .select("digit", "obs", "n", "exp_micro", "dev_micro")
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === 9)
    assert(got(1)._2 === 2L && got(2)._2 === 1L && got(9)._2 === 1L)
    assert(got(5)._2 === 0L, "absent digit → obs 0")
    assert(got.values.forall(_._3 === 4L), "n counts positives only")
    val exp1 = 4L * DataQuality.BenfordMicro.head
    assert(got(1)._4 === exp1)
    val d = (2L * 1000000L - exp1).toDouble
    assert(got(1)._5 === math.round(d * d / (exp1.toDouble * 1e6)))
  }

  test("hhi: monopoly = 1e6, even split = 1e6/k, zero-total drops") {
    val df = Seq(("m", 100L), ("e", 25L), ("e", 25L), ("e", 25L), ("e", 25L),
      ("z", 0L)).toDF("g", "w")
    val got = DataQuality.hhi(df, Seq("g"), col("w"))
      .select("g", "n", "total", "hhi_micro")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("m")._4 === 1000000L)
    assert(got("e")._4 === 250000L)
    assert(!got.contains("z"), "zero-total group drops")
  }
}
