package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping statistics — Delta/Iceberg-style data skipping without a
  * table format: a per-file min/max manifest written beside the table, and
  * a read path that opens only the files whose [min, max] range intersects
  * the query predicate.
  *
  * This is the 100 TB lever partition pruning can't reach: partitioning is
  * coarse (entity/year); within a partition a range query still scans every
  * file. Range-clustering the write (so each file owns a tight value range)
  * plus the manifest turns a full-partition scan into an O(selectivity)
  * scan, and the manifest itself is tiny (one row per FILE — at 100 TB with
  * 1 GB files that is ~10⁵ rows, broadcastable by construction).
  *
  * Skipping is file-granular and conservative: a file is read iff its range
  * CAN contain matches; the residual row filter always re-applies, so the
  * result is exactly the unpruned scan's (the q136 gate replays that
  * equivalence).
  */
object FileStats {

  private def statsPath(path: String) = s"${path.stripSuffix("/")}__filestats"

  /** Write `df` range-clustered on `statsCol` into `numFiles` files, then
    * derive the per-file (min, max, row-count) manifest from the files
    * themselves (`_metadata.file_path` — stats are computed from what was
    * actually written, never trusted from the writer's plan).
    */
  def writeWithStats(df: DataFrame, path: String, statsCol: String,
      numFiles: Int): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(numFiles, col(statsCol))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .coalesce(1) // manifest is one row per file — driver-tiny
      .write.mode("overwrite").parquet(statsPath(path))
  }

  /** Files whose [min_v, max_v] intersects [lo, hi] — the candidate set a
    * pruned read opens. Exposed for plan/pruning assertions.
    */
  def candidateFiles(spark: SparkSession, path: String,
      lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(statsPath(path))
      // manifest filter: file qualifies unless its whole range is outside
      .filter(col("min_v") <= hi && col("max_v") >= lo)
      .select("file_path")
      .collect() // one row per FILE — manifest-sized, not data-sized
      .map(_.getString(0)).toSeq.sorted

  def totalFiles(spark: SparkSession, path: String): Long =
    spark.read.parquet(statsPath(path)).count()

  /** Pruned range read: open only the candidate files, then re-apply the
    * exact row predicate. Equivalent to
    * `spark.read.parquet(path).filter(statsCol between (lo, hi))` by
    * construction — just without touching files that cannot match.
    */
  def readRange(spark: SparkSession, path: String, statsCol: String,
      lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(spark, path, lo, hi)
    val base =
      if (files.isEmpty)
        // preserve the schema with an empty relation
        spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }
}
