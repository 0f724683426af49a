package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CUSUM closed form vs the textbook recursion, plus detector behavior
  * on constant / step-change series.
  */
class ChangePointSpec extends SparkTestBase {
  import spark.implicits._

  private def run(series: Seq[(String, Int, Long)], sigma: Double = 3.0) =
    ChangePoint.cusum(series.toDF("g", "t", "v_milli"),
      Seq("g"), "t", "v_milli", sigma)
      .select("g", "t", "v_milli", "k_milli", "s_pos_milli", "s_neg_milli",
        "flag_pos", "flag_neg")
      .as[(String, Int, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().sortBy(r => (r._1, r._2))

  test("closed form equals the textbook max(0, S+d) recursion") {
    val vals = Seq(64000L, 71000L, 59000L, 90000L, 88000L, 61000L, 40000L,
      64000L, 65000L, 100000L)
    val got = run(vals.zipWithIndex.map { case (v, i) => ("a", i, v) })
    val k = math.round(vals.sum.toDouble / vals.size)
    var sp = 0L; var sn = 0L
    got.zip(vals).foreach { case (row, v) =>
      sp = math.max(0L, sp + (v - k))
      sn = math.max(0L, sn + (k - v))
      assert(row._4 === k)
      assert(row._5 === sp, s"pos at t=${row._2}")
      assert(row._6 === sn, s"neg at t=${row._2}")
    }
  }

  test("constant series never alarms") {
    val got = run((0 until 20).map(i => ("c", i, 50000L)))
    assert(got.forall(r => r._5 === 0L && r._6 === 0L && !r._7 && !r._8))
  }

  test("upward level shift fires flag_pos and not flag_neg") {
    // mean 50, sigma ~ sqrt(50) ~ 7.07, h ~ 21213; shift +30/day
    val series = (0 until 10).map(i => ("s", i, 50000L)) ++
      (10 until 20).map(i => ("s", i, 80000L))
    val got = run(series)
    assert(got.exists(_._7), "flag_pos should fire after the shift")
    assert(got.filter(_._7).map(_._2).min >= 10, "no alarm before the shift")
    // the downward statistic accumulates only BEFORE the shift (series
    // under k) and then drains: s_neg must be non-increasing from t=10 on
    val post = got.filter(_._2 >= 10).sortBy(_._2).map(_._6)
    assert(post.zip(post.tail).forall { case (x, y) => y <= x })
    assert(got.filter(_._8).map(_._2).min < 10,
      "first downward alarm comes from pre-shift evidence")
  }

  test("groups are independent detectors") {
    val a = (0 until 8).map(i => ("a", i, 10000L + i * 1000))
    val b = (0 until 8).map(i => ("b", i, 99000L))
    val got = run(a ++ b)
    assert(got.filter(_._1 == "b").forall(r => r._5 === 0L && r._6 === 0L))
    assert(got.filter(_._1 == "a").exists(r => r._5 > 0L))
  }
}
