package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order clustering: the interleave is bit-exact, pruning is
  * result-invariant, and the layout actually buys TWO-dimensional
  * skipping (the win 1-D range clustering cannot give).
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private val root = s"/tmp/graft_zorder_spec_${System.nanoTime()}"

  private def grid(): Unit = {
    // 64×64 grid, one row per cell — every (x, y) occupied, so per-file
    // boxes reflect the curve, not data sparsity (the code math itself is
    // pinned by q69's oracle and ScaleOpsSpec's reference interleave)
    val df = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, x * 64L + y))).toDF("x", "y", "v")
    ZOrder.writeClustered(df, s"$root/t", "x", "y", partitions = 16)
  }

  test("pruned rectangle read equals unpruned filter") {
    grid()
    val pruned = ZOrder.readRectangle(spark, s"$root/t", "x", "y",
        lit(10L), lit(20L), lit(40L), lit(50L))
      .orderBy("v").as[(Long, Long, Long)].collect().toSeq
    val full = spark.read.parquet(s"$root/t")
      .filter(col("x").between(10L, 20L) && col("y").between(40L, 50L))
      .orderBy("v").as[(Long, Long, Long)].collect().toSeq
    assert(pruned === full)
    assert(pruned.size === 11 * 11)
  }

  test("a rectangle prunes on BOTH axes — the 2-D win over 1-D clustering") {
    grid()
    assert(ZOrder.totalFiles(spark, s"$root/t") === 16L)
    // a quadrant-sized rectangle: 16 z-range files tile the 64×64 plane
    // into ~square cells, so ~1/4 of the files qualify (±boundary cells);
    // 1-D clustering on x would open EVERY file for the y-constrained case
    val xTight = ZOrder.candidateFiles(spark, s"$root/t",
      lit(0L), lit(15L), lit(0L), lit(63L))
    val yTight = ZOrder.candidateFiles(spark, s"$root/t",
      lit(0L), lit(63L), lit(0L), lit(15L))
    assert(xTight.size < 16, s"x-constrained candidates: ${xTight.size}")
    assert(yTight.size < 16, s"y-constrained candidates: ${yTight.size}")
    // a small square touches very few cells
    val tiny = ZOrder.candidateFiles(spark, s"$root/t",
      lit(4L), lit(11L), lit(4L), lit(11L))
    assert(tiny.size <= 4, s"tiny-rectangle candidates: ${tiny.size}")
  }

  test("empty intersection returns an empty frame with the table schema") {
    grid()
    val none = ZOrder.readRectangle(spark, s"$root/t", "x", "y",
      lit(100L), lit(200L), lit(0L), lit(63L))
    assert(none.columns.toSeq === Seq("x", "y", "v"))
    assert(none.count() === 0L)
  }
}
