package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** One-pass pairwise Pearson: known lines, nulls, sequential bit-identity. */
class CorrMatrixSpec extends SparkTestBase {
  import spark.implicits._

  test("perfect line -> 1, anti-correlation -> -1, constants -> null") {
    val df = Seq((1L, 2L, -1L, 5L), (2L, 4L, -2L, 5L), (3L, 6L, -3L, 5L))
      .toDF("a", "b", "c", "k")
    val out = CorrMatrix.pearson(df,
      Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "k" -> col("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    // sqrt(dx)*sqrt(dy) rounds once, so a perfect line lands within one
    // ulp of +/-1 (identically on both engines; the q142 gate's 9dp
    // rounding collapses it)
    assert(math.abs(out(("a", "b")).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(out(("a", "c")).asInstanceOf[Double] + 1.0) < 1e-12)
    assert(out(("a", "k")) === null) // zero variance side -> null, not NaN
    assert(out.size === 6)
  }

  test("matches a sequential reference on integer data, bit-exact") {
    val data = (1 to 500).map(i =>
      (i.toLong, (i * i % 97).toLong, (1000 - 3 * i).toLong))
    val df = data.toDF("x", "y", "z")
    val out = CorrMatrix.pearson(df.repartition(7),
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    def ref(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = BigInt(xs.size)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum
      val syy = ys.map(a => BigInt(a) * a).sum
      (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
    }
    val (xs, ys, zs) = (data.map(_._1), data.map(_._2), data.map(_._3))
    assert(out(("x", "y")) === ref(xs, ys))
    assert(out(("x", "z")) === ref(xs, zs))
    assert(out(("y", "z")) === ref(ys, zs))
    assert(out(("x", "z")) === -1.0) // z is an exact affine image of x
  }

  test("pair order follows the caller's column order, i < j only") {
    val df = Seq((1L, 2L), (2L, 1L)).toDF("p", "q")
    val rows = CorrMatrix.pearson(df, Seq("q" -> col("q"), "p" -> col("p")))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "q" && rows.head.getString(1) === "p")
    assert(rows.head.getLong(2) === 2L)
  }
}
