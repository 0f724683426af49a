package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read row-level deletes — the Iceberg/Delta "equality delete
  * file" pattern (cf. the reference's read-modify-write partition
  * overwrite, `storage/clients/base.py`, which rewrites whole partitions
  * to drop rows): instead of rewriting data files on every delete,
  * append a small parquet file of deleted KEYS and apply them at read
  * time with one anti join. `compact` folds accumulated deletes back
  * into the base and clears them — the slow path runs only when chosen.
  *
  * Scale posture: delete batches are tiny next to the base (that is the
  * point of merge-on-read), so the anti join broadcasts; when deletes
  * grow past the broadcast threshold AQE falls back to a shuffled anti
  * join keyed the same way. The base is never driver-materialized.
  * Deletes are idempotent by construction (anti join ignores duplicate
  * keys), so overlapping delete batches need no dedup pass.
  */
object DeleteVectors {

  private def dataDir(root: String, table: String) = s"$root/$table/data"
  private def delDir(root: String, table: String) = s"$root/$table/_deletes"

  /** Write (or replace) the base table. */
  def writeBase(df: DataFrame, root: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dataDir(root, table))

  /** Append one delete batch: a DataFrame of key columns only. */
  def appendDeletes(keys: DataFrame, root: String, table: String): Unit =
    keys.write.mode(SaveMode.Append).parquet(delDir(root, table))

  private def hasDeletes(spark: SparkSession, root: String, table: String): Boolean = {
    val p = new Path(delDir(root, table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Merge-on-read: base MINUS accumulated delete keys (one anti join;
    * broadcast while the delete set is small). */
  def readMerged(spark: SparkSession, root: String, table: String,
      keyCols: Seq[String]): DataFrame = {
    val base = spark.read.parquet(dataDir(root, table))
    if (!hasDeletes(spark, root, table)) base
    else base.join(spark.read.parquet(delDir(root, table)).select(
      keyCols.map(col): _*), keyCols, "left_anti")
  }

  /** Fold deletes into the base (rewrite) and clear the delete dir —
    * after this, reads touch no delete files until the next delete. */
  def compact(spark: SparkSession, root: String, table: String,
      keyCols: Seq[String]): Unit = {
    if (hasDeletes(spark, root, table)) {
      val merged = readMerged(spark, root, table, keyCols)
      val tmp = s"${dataDir(root, table)}__rewrite"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Crash-safe swap: park the old base aside BEFORE linking the
      // rewrite in, so at no instant is the table absent without a
      // recoverable copy — a crash leaves either data (old or new)
      // plus at most a stale __old/_deletes pair to sweep.
      val data = new Path(dataDir(root, table))
      val old = new Path(s"${dataDir(root, table)}__old")
      fs.delete(old, true) // stale leftover from an earlier crash
      fs.rename(data, old)
      fs.rename(new Path(tmp), data)
      fs.delete(old, true)
      fs.delete(new Path(delDir(root, table)), true)
    }
  }
}
