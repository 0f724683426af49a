package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom file skipping: no false negatives, real pruning, exact results. */
class BloomSkipSpec extends SparkTestBase {
  import spark.implicits._

  private val root = s"/tmp/graft_bloomskip_spec_${System.nanoTime()}"
  private def table = s"$root/t"

  private def written() = {
    // keys deliberately NOT range-clustered: every file's [min,max] spans
    // the whole domain, so min/max skipping would open all files
    val df = (0 until 4000).map(i => (i.toLong, i % 13)).toDF("k", "grp")
    BloomSkip.writeWithBloom(df, table, "k", numFiles = 16)
    df
  }

  test("point-lookup batch equals plain semi-join; bloom skips files") {
    written()
    val keys = Seq(17L, 940L, 2201L, 3999L).toDF("k")
    val got = BloomSkip.readPoints(spark, table, "k", keys)
      .orderBy("k").as[(Long, Int)].collect().toSeq
    val want = spark.read.parquet(table)
      .join(keys, Seq("k"), "left_semi")
      .orderBy("k").as[(Long, Int)].collect().toSeq
    assert(got === want)
    assert(got.map(_._1) === Seq(17L, 940L, 2201L, 3999L))
    val cand = BloomSkip.candidateFiles(spark, table, keys)
    assert(BloomSkip.totalFiles(spark, table) === 16L)
    // 4 keys live in ≤ 4 files; fill factor leaves FPs rare — allow slack
    assert(cand.nonEmpty && cand.size <= 8, s"candidates: ${cand.size}")
  }

  test("no false negatives: every present key survives pruning") {
    written()
    val all = (0 until 4000 by 97).map(_.toLong)
    val got = BloomSkip.readPoints(spark, table, "k", all.toDF("k"))
      .select("k").as[Long].collect().toSet
    assert(got === all.toSet)
  }

  test("absent keys: candidate files may exist (FP) but result is empty") {
    written()
    val absent = Seq(100000L, 200000L).toDF("k")
    assert(BloomSkip.readPoints(spark, table, "k", absent).count() === 0L)
  }
}
