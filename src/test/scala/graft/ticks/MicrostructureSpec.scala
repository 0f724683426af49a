package graft.ticks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Tick-rule signing, imbalance rollups, and the λ regression seam. */
class MicrostructureSpec extends SparkTestBase {
  import spark.implicits._

  private val trades = Seq(
    // (sym, t, px, sz): up, zero (carry buy), down, zero (carry sell)
    ("a", 1L, 100L, 5L), ("a", 2L, 102L, 3L), ("a", 3L, 102L, 2L),
    ("a", 4L, 99L, 4L), ("a", 5L, 99L, 6L))
    .toDF("sym", "t", "px", "sz")

  test("tickSign: up/down ticks sign, zero ticks carry, head is null") {
    val got = Microstructure.tickSign(trades, "sym", Seq("t"), "px")
      .select("t", "side").as[(Long, Option[Int])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> None, 2L -> Some(1), 3L -> Some(1),
      4L -> Some(-1), 5L -> Some(-1)))
  }

  test("flowImbalance: signed volumes and unsigned head count") {
    val got = Microstructure.flowImbalance(trades, "sym", Seq("t"), "px",
        "sz", bucket = lit("all"))
      .select("buy_vol", "sell_vol", "imbalance", "n_unsigned")
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((3L + 2L, 4L + 6L, 5L - 10L, 1L)))
  }

  test("kyleLambda: positive impact series yields positive slope") {
    // price moves proportionally to signed size → strong positive lambda
    val steps = Seq(3L, -2L, 5L, -1L, 4L, -3L, 2L, 6L, -4L, 1L)
    var px = 1000L
    val rows = steps.zipWithIndex.map { case (q, i) =>
      px += q * 2 // impact = 2 cents per unit flow
      ("s", (i + 1).toLong, px, math.abs(q))
    }
    // seed a first row so the first step has a defined delta
    val df = (("s", 0L, 1000L, 1L) +: rows).toDF("sym", "t", "px", "sz")
    val got = Microstructure.kyleLambda(df, "sym", Seq("t"), "px", "sz")
      .select("slope", "corr").as[(Double, Double)].collect()
    assert(got.nonEmpty)
    val (slope, corr) = got.head
    assert(slope > 0.5, s"impact slope: $slope")
    assert(corr > 0.5, s"flow/price correlation: $corr")
  }
}
