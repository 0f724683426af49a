package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Sorting a table by one key gives perfect min/max pruning on that key and
  * none on any other; interleaving the bits of two keys gives useful pruning
  * on BOTH (each parquet row group covers a small rectangle of the key
  * space). This is the layout trick behind Delta/Iceberg Z-ordering,
  * expressed with plain integer arithmetic: `repartitionByRange` +
  * `sortWithinPartitions` on the Morton code — no custom writer needed.
  *
  * The bit-spread is the standard mask cascade (16 bits per dimension →
  * 32-bit code), all long ops — deterministic on any engine.
  */
object ZOrder {

  /** Spread the low 16 bits of `v`: bit i moves to bit 2i. */
  private[lake] def spread16(v: Column): Column = {
    val masks = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    masks.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }
  }

  /** Morton code of two non-negative dimensions (each clamped to 16 bits). */
  def mortonCode(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` clustered by the Morton code of (xCol, yCol): range
    * partition on the code (contiguous Z-curve segments per file), sort
    * within partitions, drop the helper column on write.
    */
  def writeClustered(df: DataFrame, path: String, xCol: String, yCol: String,
      partitions: Int): Unit =
    df.withColumn("__z", mortonCode(col(xCol), col(yCol)))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
