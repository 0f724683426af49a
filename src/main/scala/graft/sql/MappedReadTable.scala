package graft.sql

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.ColumnMapping

/** SQL read surface of a COLUMN-MAPPED snapshot version: the inner table
  * scans the data files under their PHYSICAL schema (what the bytes
  * spell); this wrapper presents the version's LOGICAL schema and
  * translates names at the plan boundary — column pruning and catalyst
  * filter pushdown rename logical→physical on the way in, the scan's
  * read schema renames back on the way out. Rows are positional, so the
  * translation is purely name-level: ZERO per-row cost, and the full
  * pushdown surface (column pruning, parquet row-group filters, sidecar
  * file skipping, dynamic partition pruning) survives a rename.
  * Partition columns are never mapped (rename refuses on them), so the
  * runtime-filtering (DPP) surface passes through untranslated.
  *
  * Unmapped tables never see this class — the catalog wraps only
  * versions whose manifest schema carries `graft.physical` metadata.
  */
private[sql] class MappedReadTable(
    inner: Table with SupportsRead,
    logicalSchema: StructType)
  extends Table with SupportsRead {

  private val physOf: Map[String, String] = ColumnMapping.physicalOf(logicalSchema)
  private val logOf: Map[String, String] = ColumnMapping.logicalOf(logicalSchema)

  override def name(): String = inner.name()
  override def schema(): StructType = logicalSchema
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    inner.partitioning()

  private def toPhysical(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = physOf.getOrElse(f.name, f.name))))

  private def toLogical(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = logOf.getOrElse(f.name, f.name))))

  private def renameRefs(e: Expression): Expression = e.transform {
    case a: AttributeReference if physOf.get(a.name).exists(_ != a.name) =>
      a.withName(physOf(a.name))
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters {

      private val ib = inner.newScanBuilder(options)

      override def pruneColumns(requiredSchema: StructType): Unit = ib match {
        case p: SupportsPushDownRequiredColumns =>
          p.pruneColumns(toPhysical(requiredSchema))
        case _ =>
      }

      // exprIds survive the rename, so the residuals this returns still
      // bind in the Filter node Spark plans above the scan; only the
      // cosmetic attribute NAME inside the scan goes physical
      override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
        ib match {
          case p: SupportsPushDownCatalystFilters =>
            p.pushFilters(filters.map(renameRefs))
          case _ => filters
        }

      override def pushedFilters
          : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
        ib match {
          case p: SupportsPushDownCatalystFilters => p.pushedFilters
          case _ => Array.empty
        }

      override def build(): Scan = new MappedScan(ib.build(), toLogical _)
    }
}

/** Scan wrapper: the read schema renames physical→logical (positional —
  * the batch's rows are untouched); runtime filtering (DPP) and exact
  * sidecar statistics delegate. Equality delegates too, extended by the
  * logical view, so AQE plan reuse keeps the version-identity semantics
  * of [[DppParquetScan]].
  */
private[sql] class MappedScan(val inner: Scan,
    toLogical: StructType => StructType)
  extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics {

  override def readSchema(): StructType = toLogical(inner.readSchema())
  override def toBatch: Batch = inner.toBatch
  override def description(): String = s"Mapped(${inner.description()})"

  // partition columns are never mapped — DPP passes through verbatim
  override def filterAttributes(): Array[NamedReference] = inner match {
    case r: SupportsRuntimeFiltering => r.filterAttributes()
    case _ => Array.empty
  }
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    inner match {
      case r: SupportsRuntimeFiltering => r.filter(filters)
      case _ =>
    }
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    inner match {
      case r: SupportsRuntimeFiltering => r.filter(predicates)
      case _ =>
    }

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def equals(obj: Any): Boolean = obj match {
    case o: MappedScan => inner == o.inner && readSchema() == o.readSchema()
    case _ => false
  }
  override def hashCode(): Int = 31 * inner.hashCode() + readSchema().hashCode()
}
