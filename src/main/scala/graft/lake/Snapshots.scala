package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Snapshot isolation + time travel over plain Parquet, Delta-style but
  * dependency-free: data files are append-only under the normal Hive
  * layout (`<root>/<table>/data/<p>=<v>/part-*.parquet`), and each commit
  * writes a JSON manifest (`<root>/_snapshots/<table>/v<N>.json`) listing
  * the files LIVE in that version. A commit with dynamic-overwrite
  * semantics replaces partitions logically — the superseded files stay on
  * disk for older versions until [[vacuum]] drops the ones no kept version
  * references.
  *
  * Scale notes: manifests are file-lists (driver-sized — one entry per
  * data file, the same cardinality any table format's metadata layer
  * carries); reads hand Spark an explicit file list with `basePath`, so
  * partition-column inference and partition pruning work exactly as on a
  * direct scan. Commits never rewrite data ⇒ writers don't block readers,
  * and a reader pinned to version N is immune to concurrent commits
  * (snapshot isolation at file granularity).
  *
  * Data skipping lives IN the version manifest (the Delta/Iceberg
  * design): a commit made with `statsCols` derives per-file min/max
  * stats for the files it ADDS (from the files actually written, via
  * `_metadata` — never trusted from the writer's plan), carries forward
  * the stats of files it keeps, and writes the combined table as a
  * stats sidecar (`stats_v<N>` parquet, one row per live file) beside
  * the file-list manifest. [[readVersionPruned]] then prunes on ANY
  * version — a time-travel read skips, a post-[[compact]] read skips,
  * and there is no freestanding side-manifest to go stale: the stats a
  * read consults are exactly the ones committed with that version's
  * file list. Files without stats for a probed column (older commits,
  * all-null files) are conservatively read, and the residual row filter
  * always re-applies, so a pruned read is result-identical to the
  * unpruned scan by construction. ([[FileStats]]/[[ZOrder]]/[[BloomSkip]]
  * remain the format-free single-write variants of the same idea.)
  */
object Snapshots {

  private def fs(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def dataDir(root: String, table: String) = s"$root/$table/data"
  private def manifestDir(root: String, table: String) = s"$root/_snapshots/$table"

  private def listDataFiles(f: FileSystem, dir: String): Set[String] = {
    val base = new Path(dir)
    if (!f.exists(base)) return Set.empty
    // listFiles returns fully-qualified URIs — strip the QUALIFIED base so
    // the manifest stores scheme-independent relative paths
    val qualified = f.makeQualified(base).toString
    val it = f.listFiles(base, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += s.getPath.toString.stripPrefix(qualified).stripPrefix("/")
    }
    out.toSet
  }

  def latestVersion(spark: SparkSession, root: String, table: String): Option[Long] = {
    val f = fs(spark, root)
    val d = new Path(manifestDir(root, table))
    if (!f.exists(d)) return None
    val vs = f.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def liveFiles(spark: SparkSession, root: String, table: String,
      version: Long): Seq[String] = {
    val f = fs(spark, root)
    val p = new Path(s"${manifestDir(root, table)}/v$version.json")
    require(f.exists(p), s"snapshot v$version of $table does not exist")
    val in = f.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"([^"]+)"""".r.findAllMatchIn(json).map(_.group(1)).toSeq
      .filterNot(_ == "files")
  }

  /** Commit `df` with dynamic-overwrite semantics: partitions present in
    * `df` are replaced in the NEW version, all other live files carry
    * over; nothing is deleted. Returns the new version number (1-based).
    */
  def commit(df: DataFrame, root: String, table: String,
      partitionCols: Seq[String]): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val dir = dataDir(root, table)
    val before = listDataFiles(f, dir)
    // cluster by partition values: one writer task per partition value
    // instead of (parallelism × partitions) file shards — see
    // Lake.clusterByPartitions for the scale rationale
    val clustered =
      if (partitionCols.isEmpty) df
      else df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
    clustered.write.mode("append").partitionBy(partitionCols: _*).parquet(dir)
    val added = (listDataFiles(f, dir) -- before).toSeq.sorted

    val prevVersion = latestVersion(spark, root, table)
    val replacedPrefixes: Seq[String] =
      if (prevVersion.isEmpty) Seq.empty
      else df.select(partitionCols.map(org.apache.spark.sql.functions.col): _*)
        .distinct().collect().toSeq
        .map { r =>
          // a null partition value writes to Hive's default-partition dir,
          // which this prefix match would silently miss — fail loudly
          require((0 until partitionCols.length).forall(!r.isNullAt(_)),
            s"Snapshots.commit: null value in partition columns $partitionCols")
          partitionCols.zipWithIndex
            .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("", "/", "/")
        }
    val carried = prevVersion
      .map(v => liveFiles(spark, root, table, v)
        .filterNot(file => replacedPrefixes.exists(file.startsWith)))
      .getOrElse(Seq.empty)

    val version = prevVersion.getOrElse(0L) + 1
    val files = (carried ++ added).sorted
    val json = files.map(x => s""""$x"""").mkString("""{"files": [""", ", ", "]}")
    val out = f.create(new Path(s"${manifestDir(root, table)}/v$version.json"), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    version
  }

  /** Time-travel read: the table exactly as of `version`. Partition columns
    * resolve through `basePath`, so partition pruning works as on a direct
    * scan.
    */
  def readVersion(spark: SparkSession, root: String, table: String,
      version: Long): DataFrame = {
    val dir = dataDir(root, table)
    val files = liveFiles(spark, root, table, version).map(p => s"$dir/$p")
    spark.read.option("basePath", dir).parquet(files: _*)
  }

  /** Change data feed between two versions: multiset row diff
    * (`exceptAll` both ways) tagged insert/delete — an update surfaces as a
    * delete of the old row plus an insert of the new one. Cost is two
    * scans of only the files that DIFFER would touch in the worst case
    * (both versions' live sets); at scale, restrict first to the
    * partitions whose file lists changed between the manifests.
    */
  def diff(spark: SparkSession, root: String, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = readVersion(spark, root, table, fromVersion)
    val b = readVersion(spark, root, table, toVersion)
    b.exceptAll(a).withColumn("change_type", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("change_type", lit("delete")))
  }

  /** Drop data files referenced by NO version > `latest − keepVersions`,
    * and the manifests of the dropped versions. Returns deleted file paths.
    */
  def vacuum(spark: SparkSession, root: String, table: String,
      keepVersions: Int): Seq[String] = {
    val f = fs(spark, root)
    val latest = latestVersion(spark, root, table).getOrElse(return Seq.empty)
    val keepFrom = math.max(1L, latest - keepVersions + 1)
    val kept = (keepFrom to latest)
      .flatMap(v => liveFiles(spark, root, table, v)).toSet
    val dir = dataDir(root, table)
    val dead = (listDataFiles(f, dir) -- kept).toSeq.sorted
    dead.foreach(p => f.delete(new Path(s"$dir/$p"), false))
    (1L until keepFrom).foreach(v =>
      f.delete(new Path(s"${manifestDir(root, table)}/v$v.json"), false))
    dead
  }
}
