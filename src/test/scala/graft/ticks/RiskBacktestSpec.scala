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

  test("realizedVol: RV/BV hand math, bucket isolation, ratio null on flat") {
    val rows = Seq( // one sym, two days; day d1 returns: +3, -1, +2
      ("a", "d1", 1L, 100L), ("a", "d1", 2L, 103L),
      ("a", "d1", 3L, 102L), ("a", "d1", 4L, 104L),
      ("a", "d2", 5L, 104L), ("a", "d2", 6L, 104L)) // flat day: r=0
      .toDF("sym", "day", "t", "cents")
    val got = Indicators.realizedVol(rows, "sym", "t", "cents",
        bucket = col("day"))
      .select("bucket", "n_ret", "rv", "bv", "bv_ratio_micro")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // d1: rv = 9+1+4 = 14; bv = |−1|·|3| + |2|·|−1| = 3+2 = 5
    assert(got("d1") === (("d1", 3L, 14L, 5L,
      Some(math.round(5.0 / 14 * 1e6)))))
    assert(got("d2") === (("d2", 1L, 0L, 0L, None)), "flat day: RV=0 → null")
  }

  test("longShortTopK: spread attribution and cumulative curve") {
    // 4 securities, deterministic trends; k=1 → long best, short worst
    val rows = for {
      sid <- Seq(1L, 2L, 3L, 4L); d <- 0 until 8
    } yield (sid, f"d$d", 100L + (sid match {
      case 1 => d * 10L   // strongest up
      case 2 => d * 2L
      case 3 => -d * 2L
      case 4 => -d * 10L  // strongest down
    }))
    val got = Backtest.longShortTopK(rows.toDF("sid", "day", "cents"),
        "sid", "day", "cents", lookback = 5, k = 1)
      .select("day", "n_long", "n_short", "spread_cents", "cum_spread_cents")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // long sid1 (+10 fwd), short sid4 (−(−10) = +10) → +20 per day
    assert(got.map(_._1).toSeq === Seq("d5", "d6"))
    assert(got.forall(r => r._2 === 1L && r._3 === 1L && r._4 === 20L))
    assert(got.map(_._5).toSeq === Seq(20L, 40L), "cumulative prefix sum")
  }
}
