package graft.ticks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Indicator windows vs brute-force per-series recomputation, plus the
  * head / degenerate cases each closed form has to survive.
  */
class IndicatorsSpec extends SparkTestBase {
  import spark.implicits._

  private val px = Seq(100L, 120L, 90L, 95L, 130L, 80L, 80L, 140L)
  private def df(series: Seq[Long], g: String = "a") =
    series.zipWithIndex.map { case (c, i) => (g, i, c) }.toDF("g", "t", "cents")

  test("drawdown: running peak / dd / max-dd match a fold") {
    val got = Indicators.drawdown(df(px), "g", "t", "cents")
      .select("t", "peak_cents", "dd_cents", "max_dd_cents")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    var peak = Long.MinValue; var maxDd = Long.MinValue
    got.zip(px).foreach { case ((t, p, dd, mdd), c) =>
      peak = math.max(peak, c); maxDd = math.max(maxDd, peak - c)
      assert(p === peak, s"peak at $t")
      assert(dd === peak - c, s"dd at $t")
      assert(mdd === maxDd, s"maxDd at $t")
    }
  }

  test("drawdownSummary: worst drawdown 50 at trough 80 after peak 130") {
    val got = Indicators.drawdownSummary(df(px), "g", "t", "cents")
      .select("max_dd_cents", "peak_cents", "n_new_peaks", "n_obs")
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((50L, 140L, 4L, 8L))) // peaks set at 100,120,130,140
  }

  test("ewma: head renormalises; steady state uses full dyadic weights") {
    val got = Indicators.ewmaDyadic(df(px), "g", "t", "cents", window = 3)
      .select("t", "ewma_num", "ewma_den")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // W=3 → weights 4,2,1 over lags 0,1,2
    assert(got(0) === ((0, 100L * 4, 4L)))
    assert(got(1) === ((1, 120L * 4 + 100L * 2, 6L)))
    assert(got(2) === ((2, 90L * 4 + 120L * 2 + 100L, 7L)))
    assert(got(7) === ((7, 140L * 4 + 80L * 2 + 80L, 7L)))
  }

  test("bollinger integer test agrees with the float mean+k·std test") {
    // longer wiggly series, window 5 — compare against double math
    val series = Seq(100L, 105L, 98L, 110L, 102L, 150L, 99L, 101L, 40L,
      100L, 103L, 97L, 160L, 100L, 99L)
    // n=5 caps the attainable z at (n−1)/√n ≈ 1.79, so test with k=1
    val got = Indicators.bollingerBreach(df(series), "g", "t", "cents",
        window = 5, k = 1)
      .select("t", "breach_up", "breach_dn")
      .as[(Int, Option[Boolean], Option[Boolean])].collect().sortBy(_._1)
    got.foreach { case (t, up, dn) =>
      if (t < 4) { assert(up.isEmpty && dn.isEmpty, s"head at $t") }
      else {
        val w = series.slice(t - 4, t + 1).map(_.toDouble)
        val mean = w.sum / 5
        val std = math.sqrt(w.map(x => (x - mean) * (x - mean)).sum / 5)
        val c = series(t).toDouble
        assert(up.contains(c > mean + std), s"up at $t")
        assert(dn.contains(c < mean - std), s"dn at $t")
      }
    }
    assert(got.exists(_._2.contains(true)), "spikes must breach up")
    assert(got.exists(_._3.contains(true)), "drops must breach down")
  }

  test("rsi: bounds, monotone series saturate, flat series is null") {
    val up = (0 until 10).map(i => 100L + i)
    val gotUp = Indicators.rsi(df(up), "g", "t", "cents", window = 5)
      .select("t", "rsi").as[(Int, Option[Double])].collect().sortBy(_._1)
    assert(gotUp.filter(_._1 >= 5).forall(_._2.contains(100.0)))
    assert(gotUp.filter(_._1 < 5).forall(_._2.isEmpty), "needs 5 deltas")
    val flat = Seq.fill(10)(100L)
    val gotFlat = Indicators.rsi(df(flat), "g", "t", "cents", window = 5)
      .select("rsi").as[Option[Double]].collect()
    assert(gotFlat.forall(_.isEmpty), "G=L=0 guards to null")
    val mixed = Indicators.rsi(df(px ++ px ++ px), "g", "t", "cents", window = 5)
      .select("rsi").as[Option[Double]].collect().flatten
    assert(mixed.nonEmpty && mixed.forall(r => r >= 0.0 && r <= 100.0))
  }

  test("series are independent across groups (partition isolation)") {
    val two = df(px, "a").union(df(Seq(1000L, 10L), "b"))
    val got = Indicators.drawdownSummary(two, "g", "t", "cents")
      .select("g", "max_dd_cents").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 50L, "b" -> 990L))
  }
}
