package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** The storage substrate: entity-partitioned Parquet with idempotent
  * partition overwrite, compaction, manifests and listing (SURVEY §1.4,
  * §2.1 S9-S15, §2.10 I3/I5).
  *
  * Layout (Hive-partitioned; the reference's path-construction pruning,
  * storage/clients/ticks.py:235-292, dissolves into Catalyst partition
  * pruning):
  * {{{
  *   <root>/daily_ticks/security_id=<sid>/year=<y>/part-....parquet
  *   <root>/fundamental/cik=<cik>/part-....parquet
  *   <root>/_manifests/<table>.json
  * }}}
  *
  * 100 TB posture: the reference's per-(security, month) ~5 KB objects
  * (CLAUDE.md:166) are hostile at scale — we keep the logical partitioning
  * (entity, year) but let files be fat; [[compactYears]] is the bin-packing
  * job (I5) that folds small incremental files into consolidated ones.
  */
object Lake {

  /** Idempotent partitioned write with dynamic partition overwrite (I3 —
    * the reference's month-to-date total refetch + overwrite,
    * update/app.py:296-445): only partitions present in `df` are replaced.
    */
  /** Cluster the rows by their partition values before a partitioned
    * write, so each partition directory receives files from as few tasks
    * as possible instead of (writer parallelism × partitions) shards —
    * THE small-files control at scale: without it a 1000-task job writing
    * 365 day-partitions can emit 365 000 files. Costs one shuffle of the
    * written data, the standard trade every production lake writer makes
    * (AQE coalesces the post-shuffle side to sensible sizes).
    */
  private def clusterByPartitions(df: DataFrame, partitionCols: Seq[String]) =
    if (partitionCols.isEmpty) df
    else df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)

  def overwritePartitions(df: DataFrame, root: String, table: String,
      partitionCols: Seq[String]): Unit =
    clusterByPartitions(df, partitionCols).write
      .mode("overwrite")
      // per-write option, NOT a session conf mutation: other writers in the
      // same session keep Spark's default static overwrite semantics
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(s"$root/$table")

  /** Append-only write (U1 concat-at-rest). */
  def appendPartitions(df: DataFrame, root: String, table: String,
      partitionCols: Seq[String]): Unit =
    clusterByPartitions(df, partitionCols).write
      .mode("append").partitionBy(partitionCols: _*).parquet(s"$root/$table")

  /** Partition-pruned read (S9/§3.3): pass partition-column predicates so the
    * scan's PartitionFilters prune directories before any IO.
    */
  def read(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")

  /** I5 — year-end compaction: rewrite the given (entity, year) partitions
    * as one file each (the reference's 12-monthlies → history.parquet,
    * update/app.py:447-607). Dynamic overwrite keeps it idempotent.
    *
    * `maxRecordsPerFile` (0 = unlimited) bounds fat partitions: the writer
    * rolls to a new file every N records WITHIN the partition's single
    * task — the exact, shuffle-free file-size control (a salted
    * repartition can only approximate a file count, and hash collisions
    * merge buckets).
    */
  def compactYears(spark: SparkSession, root: String, table: String,
      years: Seq[Int], maxRecordsPerFile: Long = 0L): Unit = {
    val df = read(spark, root, table).filter(col("year").isin(years: _*))
    // Cluster BY KEY here and tell overwritePartitions not to re-cluster:
    // its own repartition would collapse with this one (Catalyst keeps
    // only the outermost of adjacent repartitions). One task per
    // (security_id, year) → one file, or ceil(rows/maxRecordsPerFile)
    // files when the cap is set.
    val keyed = df.repartition(col("security_id"), col("year"))
    keyed.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("security_id", "year")
      .parquet(s"$root/$table")
  }

  /** S13 — manifest sidecar for partitioned TABLES (one JSON per table;
    * footer KV is per file, and a partitioned table has thousands). The
    * reference's embedded-footer-KV export (security_master.py:828-892) is
    * [[FooterMetadata]] — real parquet footer key-value pairs on
    * single-file exports.
    */
  def writeManifest(spark: SparkSession, root: String, table: String,
      rowCount: Long, version: String, extra: Map[String, String] = Map.empty): Unit = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val kv = Map(
      "table" -> table,
      "row_count" -> rowCount.toString,
      "version" -> version) ++ extra
    val json = kv.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    val out = fs.create(new Path(s"$root/_manifests/$table.json"), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readManifest(spark: SparkSession, root: String, table: String): Map[String, String] = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$root/_manifests/$table.json")
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"([^"]+)":\s*"([^"]*)"""".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  /** S14 — partition listing / existence probes (the reference's
    * list_objects_v2 walking, storage/pipeline/validation.py:84-235).
    */
  def listPartitions(spark: SparkSession, root: String, table: String): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    // qualify the base so the relative-path strip below works whether the
    // caller passed a scheme-qualified root or a bare path (listStatus
    // always returns fully-qualified children)
    val base = fs.makeQualified(new Path(s"$root/$table"))
    if (!fs.exists(base)) return Seq.empty
    def walk(p: Path): Seq[String] = {
      val children = fs.listStatus(p).filter(_.isDirectory)
      if (children.isEmpty) Seq(p.toString.stripPrefix(base.toString).stripPrefix("/"))
      else children.toSeq.flatMap(c => walk(c.getPath))
    }
    walk(base).filter(_.nonEmpty).sorted
  }

  def partitionExists(spark: SparkSession, root: String, table: String,
      partitionPath: String): Boolean = {
    val fs = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$root/$table/$partitionPath"))
  }
}
