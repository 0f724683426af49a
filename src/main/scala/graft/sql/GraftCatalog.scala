package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over the [[graft.lake.Lake]] layout — the surface a Spark
  * user expects from a table store: `spark.sql("SELECT … FROM
  * graft.daily_ticks")` instead of path-shaped Scala calls. (Reference
  * precedent: `TicksClient` as the user-facing query API,
  * storage/clients/ticks.py:59-316 — here the client's read half becomes
  * a first-class catalog any SQL tool can address.)
  *
  * A DataSource-V2 `TableCatalog` whose identifiers map to the lake's
  * `<root>/<table>` parquet directories; `loadTable` delegates to Spark's
  * own `ParquetTable`, so every scan gets the full V2 read machinery —
  * schema/partition inference from the Hive layout, filter + column
  * pushdown, static partition pruning, and runtime (dynamic) partition
  * pruning on join keys — identical plans to a direct `spark.read`.
  *
  * Registration is the standard catalog plugin point (a session conf, the
  * mechanism Spark reserves for catalogs — `SparkSessionExtensions` has no
  * catalog injector):
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sql.GraftCatalog
  *   spark.sql.catalog.graft.root = s3://bucket/lake    (or any FS URI)
  * }}}
  *
  * or at runtime via [[GraftCatalog.install]]. The lake root is re-read
  * from the live session conf on every table load (Spark caches catalog
  * INSTANCES per name, so a fixture-rotating test or a multi-lake session
  * can repoint `…​.root` without a new session).
  *
  * Read-only by design: writes go through [[graft.lake.Lake]] /
  * [[graft.lake.Snapshots]], whose partition-clustering and
  * dynamic-overwrite semantics are the engine's write contract. DDL
  * through the catalog throws rather than silently diverging from them.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var initialRoot: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initialRoot = Option(options.get("root"))
  }

  override def name(): String = catalogName

  /** Live root: the session conf wins (re-pointable), the initialize-time
    * option is the fallback (static `spark-defaults.conf` deployments).
    */
  private def root: String = {
    val fromConf = SparkSession.active.conf
      .getOption(s"spark.sql.catalog.$catalogName.root")
    fromConf.orElse(initialRoot).getOrElse(throw new IllegalArgumentException(
      s"set spark.sql.catalog.$catalogName.root to the lake root path"))
  }

  private def requireTopLevel(namespace: Array[String]): Unit =
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)

  private def tablePath(ident: Identifier): Path = {
    requireTopLevel(ident.namespace)
    new Path(s"$root/${ident.name}")
  }

  private def fs(p: Path) = p.getFileSystem(
    SparkSession.active.sessionState.newHadoopConf())

  override def tableExists(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    fs(p).exists(p)
  }

  /** A table committed through [[graft.lake.Snapshots]] (has a manifest
    * dir) resolves through its manifests — NEVER the raw directory, which
    * holds every version's files; a plain Lake table resolves as its
    * directory.
    */
  private def isVersioned(name: String): Boolean = {
    val p = new Path(s"$root/_snapshots/$name")
    fs(p).exists(p)
  }

  /** Build the table, resolving INTEGER partition-directory values as
    * BIGINT. Directory names carry no declared width — Spark's inference
    * guesses the narrowest int — and a narrow partition key under a
    * bigint join key wraps the key in a cast, which
    * `PushableColumnAndNestedColumn` (the extractor behind V2 runtime-
    * filter translation) refuses: dynamic partition pruning silently dies.
    * Widening is lossless and makes the common long-keyed join cast-free.
    * Costs one extra schema inference per load (catalog-scale, not
    * query-scale).
    */
  private def widened(name: String, opts: CaseInsensitiveStringMap,
      paths: Seq[String]): DppParquetTable = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}
    val probe = new DppParquetTable(name, SparkSession.active, opts, paths,
      userSpecifiedSchema = None)
    val partCols = probe.fileIndex.partitionSchema.fieldNames.toSet
    val fields = probe.schema.fields.map { f =>
      if (partCols.contains(f.name) &&
          (f.dataType == IntegerType || f.dataType == ShortType ||
            f.dataType == ByteType)) f.copy(dataType = LongType)
      else f
    }
    val schema = StructType(fields)
    if (schema == probe.schema) probe
    else new DppParquetTable(name, SparkSession.active, opts, paths, Some(schema))
  }

  private def versionedTable(ident: Identifier, version: Long): Table = {
    val spark = SparkSession.active
    val dataDir = s"$root/${ident.name}/data"
    val files = graft.lake.Snapshots
      .liveFiles(spark, root, ident.name, version) // manifest-sized
      .map(p => s"$dataDir/$p")
    // basePath keeps Hive partition-column inference working on the
    // explicit per-version file list, exactly like Snapshots.readVersion
    widened(s"${ident.name}@v$version",
      new CaseInsensitiveStringMap(
        java.util.Map.of("path", dataDir, "basePath", dataDir)),
      files)
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!fs(p).exists(p))
      throw new NoSuchTableException(Seq(catalogName) ++ ident.namespace :+ ident.name)
    if (isVersioned(ident.name)) {
      val latest = graft.lake.Snapshots
        .latestVersion(SparkSession.active, root, ident.name)
        .getOrElse(throw new NoSuchTableException(
          Seq(catalogName) ++ ident.namespace :+ ident.name))
      return versionedTable(ident, latest)
    }
    val path = p.toString
    widened(ident.name,
      new CaseInsensitiveStringMap(java.util.Map.of("path", path)), Seq(path))
  }

  /** DML resolves tables through this overload with the requested write
    * privileges — refuse them all: a catalog INSERT would append files
    * Lake's partition clustering never shaped and Snapshots manifests
    * don't know about (silently invisible to versioned reads). Writes go
    * through Lake/Snapshots, same as DDL.
    */
  override def loadTable(ident: Identifier,
      writePrivileges: java.util.Set[
        org.apache.spark.sql.connector.catalog.TableWritePrivilege]): Table =
    readOnly("INSERT/UPDATE/DELETE/MERGE")

  /** Time travel: `SELECT … FROM graft.t VERSION AS OF 2` — resolves the
    * Snapshots manifest of that version ("v2" also accepted).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    requireTopLevel(ident.namespace)
    if (!isVersioned(ident.name))
      throw new UnsupportedOperationException(
        s"${ident.name} is not a Snapshots-versioned table — VERSION AS OF " +
          "needs a manifest history (graft.lake.Snapshots.commit)")
    versionedTable(ident, version.stripPrefix("v").toLong)
  }

  /** Wall-clock time travel: `… TIMESTAMP AS OF '<instant>'` — the latest
    * version PUBLISHED at or before the instant (manifest mtime = the
    * atomic put-if-absent publish point). `timestamp` arrives in
    * microseconds since the epoch.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    requireTopLevel(ident.namespace)
    if (!isVersioned(ident.name))
      throw new UnsupportedOperationException(
        s"${ident.name} is not a Snapshots-versioned table — TIMESTAMP AS " +
          "OF needs a manifest history (graft.lake.Snapshots.commit)")
    val v = graft.lake.Snapshots
      .versionAsOf(SparkSession.active, root, ident.name, timestamp / 1000L)
      .getOrElse(throw new NoSuchTableException(
        Seq(catalogName) ++ ident.namespace :+ ident.name))
    versionedTable(ident, v)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireTopLevel(namespace)
    val base = new Path(root)
    val f = fs(base)
    if (!f.exists(base)) return Array.empty
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(s => Identifier.of(Array.empty, s.getPath.getName))
      .sortBy(_.name)
      .toArray
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only catalog: $op goes through graft.lake.Lake/Snapshots")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

object GraftCatalog {

  /** Register the catalog on a live session under `name`, rooted at
    * `root` (idempotent; re-pointing the root takes effect immediately —
    * see class doc).
    */
  def install(spark: SparkSession, name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }
}
