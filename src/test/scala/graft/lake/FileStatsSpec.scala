package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** File-skipping manifest: pruning really skips files, never rows. */
class FileStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val root = s"/tmp/graft_filestats_spec_${System.nanoTime()}"
  private def table = s"$root/t"

  private def written() = {
    val df = (0 until 1000).map(i => (i.toLong, i % 7)).toDF("k", "grp")
    FileStats.writeWithStats(df, table, "k", numFiles = 10)
    df
  }

  test("pruned read equals unpruned filter; narrow range skips files") {
    written()
    val lo = lit(150L); val hi = lit(249L)
    val pruned = FileStats.readRange(spark, table, "k", lo, hi)
      .orderBy("k").as[(Long, Int)].collect().toSeq
    val full = spark.read.parquet(table)
      .filter(col("k").between(150L, 249L))
      .orderBy("k").as[(Long, Int)].collect().toSeq
    assert(pruned === full)
    assert(pruned.size === 100)
    val cand = FileStats.candidateFiles(spark, table, lo, hi)
    assert(FileStats.totalFiles(spark, table) === 10L)
    // 100 contiguous keys of 1000 range-clustered into 10 files span at
    // most 3 files even with sampled boundaries
    assert(cand.nonEmpty && cand.size <= 3, s"candidates: ${cand.size}")
  }

  test("boundary files are conservative: a file whose max == lo qualifies") {
    written()
    // probe exactly one key: must come back regardless of which file owns it
    val one = FileStats.readRange(spark, table, "k", lit(499L), lit(499L))
    assert(one.select("k").as[Long].collect().toSeq === Seq(499L))
  }

  test("empty intersection returns an empty frame with the table schema") {
    written()
    val none = FileStats.readRange(spark, table, "k", lit(5000L), lit(6000L))
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "grp"))
    assert(FileStats.candidateFiles(spark, table, lit(5000L), lit(6000L)).isEmpty)
  }
}
