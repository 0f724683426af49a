package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism guard for CPU-heavy map stages.
  *
  * Parquet scans parallelize by row group: a small dimension-sized file (or a
  * corpus consolidated into few large row groups) can plan as a handful of
  * input splits, which serializes any expensive per-row work (shingling,
  * hashing, embedding math) onto a handful of cores no matter how many the
  * cluster has. At full scale (thousands of files) the scan itself provides
  * the parallelism and these helpers are no-ops; on narrow inputs they insert
  * one explicit round-robin (or hash) repartition BEFORE the expensive stage —
  * a shuffle of the raw rows, which is strictly cheaper than shuffling the
  * exploded/derived output downstream.
  */
object Parallelism {

  /** Target width: the session's shuffle partitioning. */
  private def target(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Round-robin spread if (and only if) the planned scan is narrower than
    * the session's shuffle width. `df.rdd.getNumPartitions` inspects the
    * physical plan without launching a job.
    */
  def spread(df: DataFrame): DataFrame = {
    val n = target(df)
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }

  /** Hash-spread on `keys`, so a downstream groupBy/window on the same keys
    * reuses the partitioning instead of shuffling again.
    */
  def spreadBy(df: DataFrame, keys: Column*): DataFrame = {
    val n = target(df)
    if (df.rdd.getNumPartitions < n) df.repartition(n, keys: _*) else df
  }
}
