package graft.operators

import graft.SparkTestBase

/** Market-basket pair mining + association rules on hand-checked baskets. */
class CoOccurrenceSpec extends SparkTestBase {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} — with a duplicated line to
  // prove presence (distinct) semantics
  private val rows = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "b")).toDF("basket", "item")

  test("pairCounts: distinct-basket support, x < y canonical") {
    val got = CoOccurrence.pairCounts(rows, "basket", "item")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("a", "c", 2L), ("b", "c", 1L)))
  }

  test("frequentPairs honors the threshold") {
    val got = CoOccurrence.frequentPairs(rows, "basket", "item", 2L)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("a", "c", 2L)))
  }

  test("rules: exact counts and micro-rounded confidence/lift") {
    val got = CoOccurrence.rules(rows, "basket", "item", 2L)
      .select("x", "y", "support", "x_count", "y_count",
        "conf_xy_micro", "conf_yx_micro", "lift_micro")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toMap2
    // n = 4 baskets; a in 3, b in 3, c in 2
    // {a,b}: conf a→b = 2/3, conf b→a = 2/3, lift = 4*2/(3*3) = 8/9
    val ab = got(("a", "b"))
    assert(ab === ((2L, 3L, 3L, 666667L, 666667L, 888889L)))
    // {a,c}: conf a→c = 2/3, conf c→a = 2/2, lift = 4*2/(3*2) = 4/3
    val ac = got(("a", "c"))
    assert(ac === ((2L, 3L, 2L, 666667L, 1000000L, 1333333L)))
  }

  private implicit class Map2[A, B, R](
      rows: Array[(A, B, Long, Long, Long, Long, Long, Long)]) {
    def toMap2: Map[(A, B), (Long, Long, Long, Long, Long, Long)] =
      rows.map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8))).toMap
  }
}
