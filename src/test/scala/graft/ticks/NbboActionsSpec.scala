package graft.ticks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Split-adjustment rationals and NBBO forward-fill vs hand math. */
class NbboActionsSpec extends SparkTestBase {
  import spark.implicits._

  test("adjust: factor regimes before/on/after stacked splits") {
    val px = Seq(("a", "d1", 400L), ("a", "d2", 400L), ("a", "d3", 200L),
      ("a", "d4", 300L), ("a", "d5", 100L), ("b", "d1", 500L))
      .toDF("sid", "day", "cents")
    val acts = Seq(("a", "d3", 2L, 1L), ("a", "d5", 3L, 1L))
      .toDF("sid", "day", "num", "den")
    val got = CorporateActions.adjust(px, acts, "sid", "day", "cents")
      .select("sid", "day", "fnum", "fden", "adj_milli")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", "d1")) === ((1L, 6L, math.round(400.0 * 1000 / 6))))
    assert(got(("a", "d2")) === ((1L, 6L, math.round(400.0 * 1000 / 6))))
    // ON the split day the action no longer applies (strictly future only)
    assert(got(("a", "d3")) === ((1L, 3L, math.round(200.0 * 1000 / 3))))
    assert(got(("a", "d4")) === ((1L, 3L, 100000L)))
    assert(got(("a", "d5")) === ((1L, 1L, 100000L)))
    assert(got(("b", "d1")) === ((1L, 1L, 500000L)), "no actions → identity")
  }

  test("nbbo: forward fill per venue, best across venues, locked flag") {
    // one symbol, two venues; venue 0 quotes first, venue 1 later crosses
    val q = Seq(
      (7L, 1L, 0, 100L, 105L),
      (7L, 2L, 1, 98L, 103L),  // best ask now 103 (v1), best bid 100 (v0)
      (7L, 3L, 1, 106L, 108L), // v1 bid 106 > v0 ask 105 → crossed
      (7L, 4L, 0, 107L, 109L)) // v0 refreshes → uncrossed (107 < 108)... still locked? 107 >= 108? no
      .toDF("sym", "t", "venue", "bid", "ask")
    val got = Nbbo.consolidate(q, "sym", Seq("t"), "venue", "bid", "ask", 2)
      .select("t", "nbbo_bid", "nbbo_ask", "locked")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 100L, 105L, false)))
    assert(got(1) === ((2L, 100L, 103L, false)))
    assert(got(2) === ((3L, 106L, 105L, true)), "stale v0 ask crossed")
    assert(got(3) === ((4L, 107L, 108L, false)))
  }

  test("nbbo: venues without quotes yet stay null-transparent") {
    val q = Seq((1L, 1L, 2, 50L, 55L)).toDF("sym", "t", "venue", "bid", "ask")
    val got = Nbbo.consolidate(q, "sym", Seq("t"), "venue", "bid", "ask", 4)
      .select("nbbo_bid", "nbbo_ask").as[(Long, Long)].head()
    assert(got === ((50L, 55L)))
  }
}
