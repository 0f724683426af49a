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

  /** Latest version whose manifest was PUBLISHED at or before `tsMillis`
    * (wall-clock time travel — the catalog's `TIMESTAMP AS OF`). Commit
    * time is the manifest file's modification time: the atomic
    * put-if-absent publish in [[writeManifest]] makes it the one
    * authoritative instant a version became visible.
    */
  def versionAsOf(spark: SparkSession, root: String, table: String,
      tsMillis: Long): Option[Long] = {
    val f = fs(spark, root)
    val d = new Path(manifestDir(root, table))
    if (!f.exists(d)) return None
    val vs = f.listStatus(d).toSeq
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith("v") && n.endsWith(".json")
      }
      .map(s => (s.getPath.getName.stripPrefix("v").stripSuffix(".json").toLong,
        s.getModificationTime))
      .collect { case (v, mtime) if mtime <= tsMillis => v }
    if (vs.isEmpty) None else Some(vs.max)
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

  private[graft] def liveFiles(spark: SparkSession, root: String, table: String,
      version: Long): Seq[String] = {
    val f = fs(spark, root)
    val p = new Path(s"${manifestDir(root, table)}/v$version.json")
    require(f.exists(p), s"snapshot v$version of $table does not exist")
    val in = f.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"([^"]+)"""".r.findAllMatchIn(json).map(_.group(1)).toSeq
      .filterNot(_ == "files")
  }

  private def sidecarPath(root: String, table: String, version: Long) =
    s"${manifestDir(root, table)}/stats_v$version"

  /** Atomically publish version N's file list. `create(overwrite = false)`
    * is the optimistic-concurrency point (the Delta/Iceberg commit
    * protocol's put-if-absent): two writers that both computed version N
    * race on the SAME manifest path, exactly one create succeeds, and the
    * loser surfaces a [[java.util.ConcurrentModificationException]] to
    * retry against the new latest — never a silent lost update.
    */
  private[graft] def writeManifest(f: FileSystem, root: String, table: String,
      version: Long, files: Seq[String]): Unit = {
    val json = files.map(x => s""""$x"""").mkString("""{"files": [""", ", ", "]}")
    val p = new Path(s"${manifestDir(root, table)}/v$version.json")
    val out =
      try f.create(p, false)
      catch { case e: java.io.IOException if f.exists(p) =>
        throw new java.util.ConcurrentModificationException(
          s"snapshot v$version of $table was committed concurrently — " +
            "re-read the latest version and retry")
      }
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Per-file min/max over `statsCols` for the given (relative-path) data
    * files, derived from the files ACTUALLY WRITTEN via `_metadata` —
    * never trusted from the writer's plan. One output row per file.
    */
  private def deriveFileStats(spark: SparkSession, dir: String,
      relFiles: Seq[String], statsCols: Seq[String]): DataFrame = {
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.option("basePath", dir)
      .parquet(relFiles.map(p => s"$dir/$p"): _*)
      // relative path = everything after the LAST "/data/": Hive partition
      // segments are always `c=v`, so no later segment can equal "data"
      .groupBy(substring_index(col("_metadata.file_path"), "/data/", -1)
        .as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Write the `stats_v<N>` sidecar: one row per LIVE file — fresh stats
    * for added files (when `statsCols` is non-empty), carried-forward
    * stats for kept files (from the previous version's sidecar), null
    * stats for files covered by neither (pruned reads open those
    * conservatively). Skipped entirely when no stats exist on either side.
    */
  private def writeSidecar(spark: SparkSession, root: String, table: String,
      version: Long, files: Seq[String], added: Seq[String],
      carried: Seq[String], statsCols: Seq[String],
      prevVersion: Option[Long]): Unit = {
    val f = fs(spark, root)
    val fresh =
      if (statsCols.isEmpty || added.isEmpty) None
      else Some(deriveFileStats(spark, dataDir(root, table), added, statsCols))
    val keptStats = prevVersion
      .map(v => new Path(sidecarPath(root, table, v)))
      .filter(f.exists)
      .map(p => spark.read.parquet(p.toString)
        .filter(col("file").isin(carried: _*))) // manifest-sized IN-list
    val stats = (fresh.toSeq ++ keptStats.toSeq)
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    stats.foreach { st =>
      import spark.implicits._
      // one row per live file (file list is manifest-sized — driver data)
      files.toDF("file").join(st, Seq("file"), "left")
        .coalesce(1) // sidecar is one row per FILE — driver-tiny
        .write.mode("overwrite").parquet(sidecarPath(root, table, version))
    }
  }

  /** Commit `df` with dynamic-overwrite semantics: partitions present in
    * `df` are replaced in the NEW version, all other live files carry
    * over; nothing is deleted. Returns the new version number (1-based).
    *
    * With `statsCols`, per-file min/max stats are derived for the files
    * this commit ADDS and merged with the kept files' carried-forward
    * stats into the version's `stats_v<N>` sidecar (see
    * [[readVersionPruned]]).
    */
  def commit(df: DataFrame, root: String, table: String,
      partitionCols: Seq[String], statsCols: Seq[String] = Nil): Long = {
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
    writeManifest(f, root, table, version, files)
    writeSidecar(spark, root, table, version, files, added, carried,
      statsCols, prevVersion)
    version
  }

  /** Rewrite the LATEST version's data into `numFiles` files range-
    * clustered on `clusterCols`, committed as a new version whose file
    * list is the rewrite alone (a full logical replace — superseded files
    * stay on disk for older versions until [[vacuum]]). With `statsCols`,
    * fresh per-file stats are derived from the rewritten files, so a
    * post-compaction read prunes as well as (usually better than) the
    * pre-compaction one. `partitionCols` must match the table's layout;
    * the Hive directory structure is preserved.
    */
  def compact(spark: SparkSession, root: String, table: String,
      partitionCols: Seq[String], numFiles: Int, clusterCols: Seq[String],
      statsCols: Seq[String] = Nil): Long = {
    val latest = latestVersion(spark, root, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshot of $table to compact"))
    val f = fs(spark, root)
    val dir = dataDir(root, table)
    val before = listDataFiles(f, dir)
    readVersion(spark, root, table, latest)
      .repartitionByRange(numFiles, (partitionCols ++ clusterCols).map(col): _*)
      .write.mode("append").partitionBy(partitionCols: _*).parquet(dir)
    val added = (listDataFiles(f, dir) -- before).toSeq.sorted
    val version = latest + 1
    writeManifest(f, root, table, version, added)
    writeSidecar(spark, root, table, version, added, added, Seq.empty,
      statsCols, None)
    version
  }

  /** Files of `version` whose `[min_<statsCol>, max_<statsCol>]` range can
    * intersect `[lo, hi]` — the set a pruned read opens. Conservative by
    * construction: files with no stats for `statsCol` (no sidecar, older
    * commits, all-null files) always qualify. Exposed for pruning asserts.
    */
  def candidateFiles(spark: SparkSession, root: String, table: String,
      version: Long, statsCol: String, lo: Column, hi: Column): Seq[String] = {
    val all = liveFiles(spark, root, table, version).sorted
    val f = fs(spark, root)
    val p = new Path(sidecarPath(root, table, version))
    if (!f.exists(p)) return all
    val sidecar = spark.read.parquet(p.toString)
    if (!sidecar.columns.contains(s"min_$statsCol")) return all
    val cands = sidecar
      .filter(col(s"min_$statsCol").isNull || col(s"max_$statsCol").isNull ||
        (col(s"min_$statsCol") <= hi && col(s"max_$statsCol") >= lo))
      .select("file")
      .collect() // one row per FILE — sidecar-sized, not data-sized
      .map(_.getString(0)).toSet
    // a live file absent from the sidecar (should not happen — the sidecar
    // carries one row per live file) is read conservatively
    val inSidecar = sidecar.select("file")
      .collect().map(_.getString(0)).toSet // sidecar-sized
    all.filter(fp => cands.contains(fp) || !inSidecar.contains(fp))
  }

  /** Pruned time-travel read: open only [[candidateFiles]] of `version`,
    * then re-apply the exact row predicate — result-identical to
    * `readVersion(...).filter(statsCol between (lo, hi))` by construction,
    * minus the files whose stats prove they cannot match. Works on ANY
    * version: the stats consulted are exactly the ones committed with that
    * version's file list, so neither time travel nor [[compact]] can see
    * stale skipping metadata.
    */
  def readVersionPruned(spark: SparkSession, root: String, table: String,
      version: Long, statsCol: String, lo: Column, hi: Column): DataFrame = {
    val dir = dataDir(root, table)
    val files = candidateFiles(spark, root, table, version, statsCol, lo, hi)
    val base =
      if (files.isEmpty)
        // preserve the schema with an empty relation
        readVersion(spark, root, table, version).filter(lit(false))
      else spark.read.option("basePath", dir)
        .parquet(files.map(p => s"$dir/$p"): _*)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
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
    (1L until keepFrom).foreach { v =>
      f.delete(new Path(s"${manifestDir(root, table)}/v$v.json"), false)
      f.delete(new Path(sidecarPath(root, table, v)), true)
    }
    dead
  }
}
