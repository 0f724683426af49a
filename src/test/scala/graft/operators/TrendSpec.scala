package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TrendSpec extends SparkTestBase {
  import spark.implicits._

  test("slope/intercept/corr match the closed form on a known line") {
    // y = 3x + 7 exactly → slope 3, intercept 7, corr 1
    val df = Seq((1L, 0L, 7L), (1L, 1L, 10L), (1L, 2L, 13L), (1L, 3L, 16L))
      .toDF("g", "x", "y")
    val r = Trend.ols(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 3.0)
    assert(r.getDouble(3) == 7.0)
    // corr passes through two sqrts — correctly rounded, so deterministic,
    // but 1.0 only to an ulp
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("anti-correlated data gives corr -1, noisy data |corr| < 1") {
    val df = Seq(
      (1L, 0L, 9L), (1L, 1L, 7L), (1L, 2L, 5L), // perfect negative
      (2L, 0L, 1L), (2L, 1L, 5L), (2L, 2L, 2L) // noisy
    ).toDF("g", "x", "y")
    val out = Trend.ols(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(out(1L) + 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1.0)
  }

  test("zero-variance groups are dropped, not divided by zero") {
    val df = Seq(
      (1L, 5L, 1L), (1L, 5L, 2L), // x constant
      (2L, 1L, 4L), (2L, 2L, 4L), // y constant
      (3L, 0L, 0L), (3L, 1L, 2L) // healthy
    ).toDF("g", "x", "y")
    val out = Trend.ols(df, Seq("g"), col("x"), col("y")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
    assert(out.head.getDouble(2) == 2.0)
  }

  test("moment sums agree with a sequential reference on random data") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(4).toLong,
      rnd.nextInt(1000).toLong - 500, rnd.nextInt(10000).toLong - 5000))
    val out = Trend.ols(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      // integer moments are order-insensitive → doubles must be BIT-exact
      assert(out(g) == ((slope, icept)), s"group $g")
    }
  }
}
