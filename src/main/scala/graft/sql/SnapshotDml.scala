package graft.sql

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/** Marker for write-capable resolutions of a Snapshots-versioned table —
  * what the catalog hands the analyzer when a DML statement requests
  * write privileges. Carries enough identity for the MERGE resolution
  * rule ([[SnapshotMergeRule]]) to re-enter the lake API.
  */
trait SnapshotDmlTarget {
  def lakeRoot: String
  def lakeTable: String
  def lakePartitionCols: Seq[String]
  def lakeStatsCols: Seq[String]
}

/** `DELETE FROM graft.t WHERE …` over a Snapshots-versioned table, routed
  * through the commit protocol as a MERGE-ON-READ delete
  * ([[graft.lake.Snapshots.deleteWhere]]): the predicate becomes a
  * manifest delete vector — no data file is rewritten, prior versions are
  * untouched, and both the Scala and SQL read paths apply the vector
  * (SQL via [[MorRead]]). `DELETE FROM t` without WHERE (or with a
  * constant-true predicate) truncates via
  * [[graft.lake.Snapshots.deleteAll]] — a manifest with no live files.
  *
  * Implemented as DSV2 [[sources.Filter]]-based `SupportsDelete`: Spark
  * plans `DeleteFromTable` as a metadata-only delete when every predicate
  * translates to source filters; an untranslatable predicate fails the
  * statement loudly (`canDeleteWhere` = false) rather than silently
  * deleting the wrong rows. UPDATE and MERGE resolve against this same
  * table through their session-extension rules ([[SnapshotUpdateRule]],
  * [[SnapshotMergeRule]]).
  */
class SnapshotDmlTable(
    tableName: String,
    override val lakeRoot: String,
    override val lakeTable: String,
    override val lakePartitionCols: Seq[String],
    override val lakeStatsCols: Seq[String],
    readTable: org.apache.spark.sql.connector.catalog.Table
      with org.apache.spark.sql.connector.catalog.SupportsRead)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with SnapshotDmlTarget {

  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = tableName
  override def schema(): StructType = readTable.schema

  // readable (DML analysis requires a readable target — and MERGE scans
  // it); reads delegate to the SAME versioned scan loadTable(ident)
  // resolves, merge-on-read vectors and sidecar skipping included.
  // AUTOMATIC_SCHEMA_EVOLUTION opts into Spark's own MERGE … WITH SCHEMA
  // EVOLUTION resolution (ResolveMergeIntoSchemaEvolution computes the
  // AddColumn diff and calls GraftCatalog.alterTable, which publishes a
  // metadata-only evolved version — Snapshots.evolveSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    readTable.newScanBuilder(options)

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(f => SnapshotDml.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val spark = SparkSession.active
    val cols = filters.flatMap(_.references).distinct
    if (cols.isEmpty)
      // unconditioned DELETE (or constant predicate): full truncate
      graft.lake.Snapshots.deleteAll(spark, lakeRoot, lakeTable)
    else {
      val cond = filters.toSeq
        .map(f => SnapshotDml.filterToColumn(f).getOrElse(
          throw new UnsupportedOperationException(
            s"DELETE predicate $f does not translate to a source filter")))
        .reduce(_ && _)
      graft.lake.Snapshots.deleteWhere(spark, lakeRoot, lakeTable, cond)
    }
  }
}

/** CDC capture switch shared by the row-level verbs: with
  * `spark.graft.cdc.write = true`, UPDATE and row-level MERGE additionally
  * write per-commit change files (pre/post-image rows with `_change_type`
  * ∈ insert / delete / update_preimage / update_postimage, the Delta CDF
  * row shape) referenced from the manifest — the change feed then serves
  * those rewrite-shaped versions EXACTLY instead of refusing. Priced
  * honestly: a second write of only the CHANGED rows (the verbs already
  * compute them), plus one extra evaluation of the (pruned) rewrite plan.
  */
object SnapshotCdc {
  val WriteConf = "spark.graft.cdc.write"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(WriteConf).exists(_.toBoolean)

  /** The `_change_type` column is reserved while capture is on. */
  def checkReserved(columns: Seq[String], table: String): Unit =
    require(!columns.contains(CdfSource.ChangeType),
      s"$table carries a column named ${CdfSource.ChangeType}, which CDC " +
        s"capture reserves — disable $WriteConf for this statement")
}

object SnapshotDml {

  /** V1 source filter → Column, total over the shapes Spark's filter
    * translation emits; None on anything unknown (the statement then
    * fails loudly at `canDeleteWhere`).
    */
  def filterToColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a && b
    case sources.Or(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
    case sources.Not(c) => filterToColumn(c).map(not)
    case _: sources.AlwaysTrue => Some(lit(true))
    case _: sources.AlwaysFalse => Some(lit(false))
    case _ => None
  }
}
