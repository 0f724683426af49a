package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additive schema evolution over a batch-structured parquet lake —
  * columns appear over time and integer/float widths widen, and old
  * batches must stay readable forever without rewrite (the reference
  * pins schemas per dataset in `storage/utils/schemas.py`; an evolving
  * lake needs the read side to reconcile versions instead).
  *
  * Spark's `mergeSchema` cannot do this: parquet footer merging throws
  * on int32-vs-int64 conflicts instead of widening. The engine move is
  * per-batch schema reconciliation — read each batch directory with its
  * OWN footer schema, cast shared columns up a widening lattice
  * (int→long, float→double, never narrowing), null-fill columns a batch
  * predates, and `unionByName`. Batch listing is driver-side directory
  * metadata (dimension-sized); the data path stays one distributed scan
  * per batch with casts fused into the scan projection.
  */
object SchemaEvolution {

  private def tableDir(root: String, table: String) = s"$root/$table"
  private def batchDir(root: String, table: String, batch: Int) =
    s"${tableDir(root, table)}/batch=$batch"

  /** Append one batch under its own directory; its schema is free to
    * add columns / widen types relative to earlier batches. */
  def writeBatch(df: DataFrame, root: String, table: String, batch: Int): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(batchDir(root, table, batch))

  /** The widening lattice: the smallest type both sides cast to
    * losslessly. Unrelated types refuse (schema evolution is additive,
    * not arbitrary). */
  private[lake] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (ByteType | ShortType | IntegerType, LongType) => LongType
    case (LongType, ByteType | ShortType | IntegerType) => LongType
    case (ByteType | ShortType, IntegerType) => IntegerType
    case (IntegerType, ByteType | ShortType) => IntegerType
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (ByteType | ShortType | IntegerType | LongType | FloatType, DoubleType) |
         (DoubleType, ByteType | ShortType | IntegerType | LongType | FloatType) =>
      DoubleType
    case _ => throw new IllegalArgumentException(
      s"no lossless widening between $a and $b")
  }

  /** Read every batch, reconciled to the widened union schema. Column
    * order follows first appearance across batch order. */
  def readAll(spark: SparkSession, root: String, table: String): DataFrame = {
    val dir = new Path(tableDir(root, table))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // driver-side directory listing: one entry per batch (dimension-sized)
    val batches = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toInt)
      .sorted
    require(batches.nonEmpty, s"no batches under $dir")
    val dfs = batches.map(b =>
      b -> spark.read.parquet(batchDir(root, table, b)))
    // `_batch` is the provenance column readAll appends — a data column
    // by that name would silently become ambiguous downstream.
    dfs.find(_._2.columns.contains("_batch")).foreach { case (b, _) =>
      throw new IllegalArgumentException(
        s"batch $b already contains a `_batch` column — rename it; " +
          "readAll reserves `_batch` for batch provenance")
    }
    // fold the union schema through the widening lattice
    val target = scala.collection.mutable.LinkedHashMap[String, DataType]()
    dfs.foreach { case (_, df) =>
      df.schema.fields.foreach { f =>
        target(f.name) = target.get(f.name).map(widen(_, f.dataType))
          .getOrElse(f.dataType)
      }
    }
    dfs.map { case (b, df) =>
      val have = df.columns.toSet
      df.select(target.toSeq.map { case (name, dt) =>
        (if (have(name)) col(name).cast(dt)
         else lit(null).cast(dt)).as(name)
      } :+ lit(b).as("_batch"): _*)
    }.reduce(_.unionByName(_))
  }
}
