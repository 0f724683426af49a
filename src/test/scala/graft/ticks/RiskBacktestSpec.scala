package graft.ticks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact order-statistic VaR/ES and the momentum backtest vs hand math. */
class RiskBacktestSpec extends SparkTestBase {
  import spark.implicits._

  test("historicalVar: k-th smallest delta, exact ES tail") {
    // deltas: 20 of them so k = ceil(0.05*20) = 1 → worst delta
    val cents = Seq(100L) ++ (1 to 20).map(i => 100L + i * (if (i % 3 == 0) -2 else 3))
    val df = cents.zipWithIndex.map { case (c, i) => ("a", f"d$i%02d", c) }
      .toDF("g", "day", "cents")
    val got = Risk.historicalVar(df, "g", "day", "cents", 5, 100)
      .select("n_deltas", "var_cents", "es_sum_cents", "es_n")
      .as[(Long, Long, Long, Long)].head()
    val deltas = cents.sliding(2).map(p => p(1) - p(0)).toSeq
    val sorted = deltas.sorted
    val k = (deltas.size * 5 + 99) / 100
    assert(got._1 === deltas.size)
    assert(got._2 === sorted(k - 1), "var = k-th smallest delta")
    assert(got._3 === sorted.take(k).sum && got._4 === k)
  }

  test("historicalVar: integer ceil at the n*alpha boundary (n = 20 => k = 1)") {
    // float ceil(20 * 0.05) can give 2; the div formula must give 1
    val cents = (0 to 20).map(i => 100L + i) // 20 deltas of +1
    val df = cents.zipWithIndex.map { case (c, i) => ("b", f"d$i%02d", c) }
      .toDF("g", "day", "cents")
    val got = Risk.historicalVar(df, "g", "day", "cents", 5, 100)
      .select("es_n").as[Long].head()
    assert(got === 1L)
  }

  test("momentumTopK: selection, attribution, and day isolation") {
    // 3 securities, 8 days; security 1 trends up, 2 flat, 3 down
    val rows = for {
      sid <- Seq(1L, 2L, 3L); d <- 0 until 8
    } yield (sid, f"d$d", 100L + (sid match {
      case 1 => d * 10L
      case 2 => 0L
      case 3 => -d * 5L
    }))
    val df = rows.toDF("sid", "day", "cents")
    val got = Backtest.momentumTopK(df, "sid", "day", "cents",
        lookback = 5, k = 1)
      .select("day", "n_selected", "pnl_cents")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // rows with both a 5-lag and a lead: days d5, d6 (d7 has no forward)
    assert(got.map(_._1).toSeq === Seq("d5", "d6"))
    // top-1 momentum is always security 1 (+50 over 5 days); fwd = +10
    assert(got.forall { case (_, n, pnl) => n === 1L && pnl === 10L })
  }
}
