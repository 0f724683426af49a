package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Globally-ordered prefix aggregation WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partitioning moves the whole relation to one
  * task — fine for a 50k-row dimension, fatal for anything bigger. The
  * classic distributed alternative (two-phase prefix sum):
  *
  *   1. range-partition on the order keys (each partition holds a contiguous
  *      key range, partitions are mutually ordered);
  *   2. per-partition running sum via an ordinary window over
  *      `spark_partition_id()`;
  *   3. per-partition totals (one tiny row per partition) are prefix-summed
  *      on the driver and joined back as broadcast offsets.
  *
  * Output values are independent of where the range boundaries land, so the
  * result is deterministic as long as `orderCols` is a TOTAL order (no
  * duplicate key tuples).
  */
object GlobalOrder {

  /** `out` = running sum of `value` over the global `orderCols` order
    * (inclusive of the current row). Requires `orderCols` to be unique per
    * row. Adds no other columns; input column set is preserved.
    */
  def runningSum(df: DataFrame, orderCols: Seq[String], value: Column,
      out: String): DataFrame = {
    val ord = orderCols.map(col)
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // materialize EAGERLY so both consumers below read the SAME
    // materialized partitioning — partition ids must be identical between
    // the running-sum branch and the totals branch, and the checkpointed
    // blocks guarantee each partition is computed exactly once. Unlike the
    // earlier persist() (which had no safe unpersist point and pinned one
    // vertex-set-sized relation per call for the session's lifetime), the
    // blocks are ContextCleaner-reclaimed when callers drop the result.
    val local = Materialize.once(df
      .repartitionByRange(n, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
      .withColumn("__local",
        sum(col("__v")).over(
          Window.partitionBy(col("__pid")).orderBy(ord: _*)
            .rowsBetween(Window.unboundedPreceding, 0))))

    // Per-partition totals → exclusive prefix via a tiny self-join
    // (p2 < p1): one row per partition, so O(P²) pairs at P = shuffle
    // partitions is negligible at any data scale. Fully lazy — no
    // plan-build-time job, no driver round-trip, no global window.
    val totals = local.groupBy(col("__pid")).agg(sum(col("__v")).as("__tot"))
    val offsets = totals.select(col("__pid"))
      .join(totals.select(col("__pid").as("__p2"), col("__tot")),
        col("__p2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__tot")), lit(0L)).as("__off"))

    local.join(broadcast(offsets), Seq("__pid"), "left")
      .withColumn(out, col("__local") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__v", "__local", "__off")
  }

  /** `out` = dense 1-based row number over the global `orderCols` order:
    * a running count of rows. */
  def runningRowNumber(df: DataFrame, orderCols: Seq[String], out: String): DataFrame =
    runningSum(df, orderCols, lit(1L), out)
}
