package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Trailing-window aggregate join: prefix-sum identity vs brute-force
  * window scan, boundary inclusivity, tied timestamps, empty windows.
  */
class RangeAggSpec extends SparkTestBase {
  import spark.implicits._

  private def run(left: Seq[(String, Long)], right: Seq[(String, Long, Long)],
      w: Long): Map[(String, Long), (Long, Long)] =
    RangeAgg.trailingSum(
      left.toDF("k", "t"), right.toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", "v", lit(w))
      .select("k", "t", "trail_sum", "trail_cnt")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("half-open window (t-w, t]: boundary rows in/out exactly") {
    val right = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 4L))
    val got = run(Seq(("a", 30L), ("a", 29L), ("a", 40L)), right, w = 10L)
    assert(got(("a", 30L)) === ((4L, 1L))) // (20,30]: rt=20 excluded, rt=30 in
    assert(got(("a", 29L)) === ((2L, 1L))) // (19,29]: rt=20 only
    assert(got(("a", 40L)) === ((0L, 0L))) // (30,40]: rt=30 excluded
  }

  test("matches brute force on a random fixture") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 60).map(_ => ("k" + rnd.nextInt(3), rnd.nextInt(100).toLong))
    val right = (1 to 200).map(_ =>
      ("k" + rnd.nextInt(3), rnd.nextInt(100).toLong, rnd.nextInt(9).toLong))
    val w = 15L
    val got = run(left, right, w)
    left.foreach { case (k, t) =>
      val inWin = right.filter(r => r._1 == k && r._2 > t - w && r._2 <= t)
      assert(got((k, t)) === ((inWin.map(_._3).sum, inWin.size.toLong)),
        s"at ($k, $t)")
    }
  }

  test("tied right timestamps all count once each") {
    val right = Seq(("a", 10L, 1L), ("a", 10L, 2L), ("a", 10L, 3L))
    val got = run(Seq(("a", 10L), ("a", 9L)), right, w = 5L)
    assert(got(("a", 10L)) === ((6L, 3L)))
    assert(got(("a", 9L)) === ((0L, 0L))) // window (4, 9] misses t=10
  }

  test("empty window and unseen key give zeros, not nulls") {
    val got = run(Seq(("a", 5L), ("z", 50L)), Seq(("a", 40L, 7L)), w = 10L)
    assert(got(("a", 5L)) === ((0L, 0L)))
    assert(got(("z", 50L)) === ((0L, 0L)))
  }
}
