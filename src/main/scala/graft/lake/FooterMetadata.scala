package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** S13 — embedded parquet footer key-value metadata (reference
  * security_master.py:828-892: the master export carries
  * `crsp_end_date` / `export_timestamp` / `version` / `row_count` in the
  * file's own footer, readable by ANY parquet client with no sidecar).
  *
  * Spark's writer has no per-file extra-KV hook, so [[embed]] post-processes
  * the file with parquet-hadoop: row groups are appended VERBATIM
  * (`ParquetFileWriter.appendFile` — raw byte copy, no decode/re-encode) and
  * the footer is rewritten with the merged KV map. Existing entries —
  * including Spark's own schema key, which keeps the file Spark-readable —
  * are preserved; new keys win on collision.
  *
  * The lake tables keep their `_manifests` sidecar (one JSON per TABLE —
  * footer KV is per FILE and a partitioned table has thousands); the footer
  * path is for single-file exports where self-description matters.
  */
object FooterMetadata {

  /** Merge `kv` into the footer key-value metadata of one parquet file. */
  def embed(path: String, kv: Map[String, String], conf: Configuration): Unit = {
    val p = new Path(path)
    val in = HadoopInputFile.fromPath(p, conf)
    val reader = ParquetFileReader.open(in)
    val (schema, existing) =
      try {
        val fmd = reader.getFooter.getFileMetaData
        (fmd.getSchema, fmd.getKeyValueMetaData.asScala.toMap)
      } finally reader.close()
    val tmp = new Path(path + ".kv-tmp")
    val writer = new ParquetFileWriter(HadoopOutputFile.fromPath(tmp, conf),
      schema, ParquetFileWriter.Mode.OVERWRITE,
      ParquetWriter.DEFAULT_BLOCK_SIZE, ParquetWriter.MAX_PADDING_SIZE_DEFAULT)
    writer.start()
    writer.appendFile(in)
    writer.end((existing ++ kv).asJava)
    val fs = p.getFileSystem(conf)
    if (!fs.delete(p, false) || !fs.rename(tmp, p))
      throw new java.io.IOException(s"footer-metadata swap failed for $path")
  }

  /** Read a parquet file's footer key-value metadata. */
  def read(path: String, conf: Configuration): Map[String, String] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
    finally reader.close()
  }

  /** The reference's master export: ONE parquet file at `path` with the four
    * footer fields embedded. `df` is coalesced to a single task (the master
    * is dimension-sized); `exportTimestamp` is caller-supplied so exports
    * are reproducible/testable rather than wall-clock-bound.
    */
  def exportWithMetadata(df: DataFrame, path: String, crspEndDate: String,
      exportTimestamp: String, version: String = "1.0"): Map[String, String] = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val stage = path + ".export-stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val fs = new Path(stage).getFileSystem(conf)
    val part = fs.listStatus(new Path(stage))
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new java.io.IOException(s"no parquet part under $stage"))
    val target = new Path(path)
    fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new java.io.IOException(s"rename $part -> $target failed")
    fs.delete(new Path(stage), true)
    val kv = Map(
      "crsp_end_date" -> crspEndDate,
      "export_timestamp" -> exportTimestamp,
      "version" -> version,
      "row_count" -> df.count().toString)
    embed(path, kv, conf)
    kv
  }

  /** Load a master export: rows + the footer metadata map (reference
    * `_load_from_s3`, security_master.py:857-892).
    */
  def loadWithMetadata(spark: SparkSession, path: String): (DataFrame, Map[String, String]) =
    (spark.read.parquet(path),
      read(path, spark.sparkContext.hadoopConfiguration))
}
