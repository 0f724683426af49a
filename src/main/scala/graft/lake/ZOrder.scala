package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * Skipping ([[readRectangle]]) stays stats-based and conservative,
  * exactly like [[FileStats]] one dimension up: the manifest stores
  * per-file min/max of the PLAIN columns (never the code), a file is
  * opened iff its box intersects the query rectangle, and the residual
  * row filter always re-applies — so the pruned read is result-identical
  * to the unpruned scan by construction (the q201 gate replays that
  * equivalence) and no BIGMIN/quadtree interval math is needed for
  * correctness. The curve's only job is making the boxes tight: that is
  * what turns "perfect pruning on one axis" into "~O(selectivity) files
  * whichever axis the rectangle constrains". At 100 TB the write is one
  * range shuffle on the code (sample-based boundaries, no driver
  * materialization) and the manifest is one row per FILE — broadcast-sized
  * at any corpus.
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

  /** N-dimensional Morton code (16 bits per dimension, like the 2-D
    * form). One dimension degenerates to the column itself; two uses the
    * mask-cascade fast path; beyond that, a constant-size bit-gather
    * expression (16·N shift/or terms — all long ops, codegen-friendly).
    */
  def mortonCode(cols: Seq[Column]): Column = cols match {
    case Seq(one) => one
    case Seq(x, y) => mortonCode(x, y)
    case cs =>
      val n = cs.length
      (0 until 16).flatMap(i => cs.zipWithIndex.map { case (c, d) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d) })
        .reduce(_ bitwiseOR _)
  }

  private def statsPath(path: String) = s"${path.stripSuffix("/")}__zstats"

  /** Write `df` clustered by the Morton code of (xCol, yCol): range
    * partition on the code (contiguous Z-curve segments per file), sort
    * within partitions (so parquet row-group stats inherit the locality),
    * drop the helper column on write — then derive the per-file
    * two-dimensional (x/y min/max, row-count) manifest from the files
    * themselves (`_metadata.file_path`: stats come from what was actually
    * written, never trusted from the writer's plan).
    */
  def writeClustered(df: DataFrame, path: String, xCol: String, yCol: String,
      partitions: Int): Unit = {
    val spark = df.sparkSession
    df.withColumn("__z", mortonCode(col(xCol), col(yCol)))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        count(lit(1)).as("n_rows"))
      .coalesce(1) // manifest is one row per file — driver-tiny
      .write.mode("overwrite").parquet(statsPath(path))
  }

  /** Files whose per-file box intersects the rectangle — the candidate
    * set a pruned read opens. Exposed for pruning assertions. */
  def candidateFiles(spark: SparkSession, path: String,
      x1: Column, x2: Column, y1: Column, y2: Column): Seq[String] =
    spark.read.parquet(statsPath(path))
      .filter(col("x_min") <= x2 && col("x_max") >= x1 &&
        col("y_min") <= y2 && col("y_max") >= y1)
      .select("file_path")
      .collect() // one row per FILE — manifest-sized, not data-sized
      .map(_.getString(0)).toSeq.sorted

  def totalFiles(spark: SparkSession, path: String): Long =
    spark.read.parquet(statsPath(path)).count()

  /** Pruned rectangle read: open only the candidate files, then re-apply
    * the exact row predicate — result-identical to the unpruned
    * `filter(x between … and y between …)` scan by construction.
    */
  def readRectangle(spark: SparkSession, path: String, xCol: String,
      yCol: String, x1: Column, x2: Column, y1: Column, y2: Column)
      : DataFrame = {
    val files = candidateFiles(spark, path, x1, x2, y1, y2)
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(xCol) >= x1 && col(xCol) <= x2 &&
      col(yCol) >= y1 && col(yCol) <= y2)
  }
}
