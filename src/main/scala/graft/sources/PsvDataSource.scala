package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for pipe-separated-values files with a header line —
  * the reference's Nasdaq universe feed format (`nasdaqtraded.txt`,
  * universe/current.py:119-146), realized as a first-class Spark connector
  * instead of a driver-side parse.
  *
  * Demonstrated extension surface (the one Spark integration point the
  * engine didn't already exercise):
  *  - `TableProvider` with header-driven schema inference;
  *  - `SupportsPushDownRequiredColumns` — only requested fields are
  *    materialized into rows (`.explain` shows the pruned ReadSchema);
  *  - `SupportsPushDownFilters` — EqualTo / StringStartsWith / IsNotNull
  *    evaluate inside the partition reader, before rows reach the engine
  *    (`.explain` shows PushedFilters), so a selective predicate never
  *    allocates non-matching rows;
  *  - one `InputPartition` per file: a universe drop is a directory of
  *    per-day files, so file granularity IS the natural parallelism (a
  *    production splittable variant would add byte-range partitions, as
  *    Spark's own CSV source does).
  *
  * All columns surface as nullable strings (the format carries no types);
  * casts belong to the query, as with Spark's own CSV reader when
  * inference is off. Format contract (matching the upstream feed): fields
  * never contain the separator — there is no quoting or escaping layer;
  * short rows pad with empty strings, long rows keep extra fields out of
  * the projection.
  *
  * Usage: `spark.read.format("graft.sources.PsvDataSource").load(dir)`.
  */
class PsvDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PsvUtil.schemaOf(PsvUtil.paths(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PsvTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class PsvTable(path: String, override val schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"psv:$path"
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PsvScanBuilder(path, schema)
}

private[sources] class PsvScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Accept what a line-level scan can evaluate on raw strings; everything
    * else stays with the engine. (Filters are also RE-evaluated by Spark
    * post-scan — pushdown is a data-reduction contract, not a correctness
    * transfer — so accepting a filter can never change results.)
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) = filters.partition {
      case EqualTo(_, _: String) => true
      case StringStartsWith(_, _) => true
      case IsNotNull(_) => true
      case _ => false
    }
    pushed = supported
    unsupported
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new PsvScan(path, fullSchema, required, pushed)
}

private[sources] class PsvScan(path: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PsvScan(path=$path, pushed=${pushed.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    PsvUtil.paths(path).map(p => PsvInputPartition(p)).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // Serialize the Hadoop conf ourselves (Configuration is not
    // java-serializable); executors rebuild it lazily.
    val confProps = {
      val c = SparkSession.active.sessionState.newHadoopConf()
      c.iterator().asScala.map(e => (e.getKey, e.getValue)).toMap
    }
    PsvReaderFactory(fullSchema.fieldNames, required.fieldNames, pushed, confProps)
  }
}

private[sources] case class PsvInputPartition(path: String) extends InputPartition

private[sources] case class PsvReaderFactory(allCols: Array[String],
    requiredCols: Array[String], pushed: Array[Filter],
    confProps: Map[String, String]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val conf = new Configuration(false)
    confProps.foreach { case (k, v) => conf.set(k, v) }
    new PsvPartitionReader(
      partition.asInstanceOf[PsvInputPartition].path,
      allCols, requiredCols, pushed, conf)
  }
}

private[sources] class PsvPartitionReader(path: String, allCols: Array[String],
    requiredCols: Array[String], pushed: Array[Filter], conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val colIndex: Map[String, Int] = allCols.zipWithIndex.toMap
  private val outIdx: Array[Int] = requiredCols.map(colIndex)
  private val reader = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  }
  reader.readLine() // header
  private var current: Array[String] = _

  private def matches(row: Array[String]): Boolean = pushed.forall {
    case EqualTo(a, v: String) => row(colIndex(a)) == v
    case StringStartsWith(a, p) => row(colIndex(a)).startsWith(p)
    case IsNotNull(_) => true
    case _ => true
  }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val row = line.split('|').padTo(allCols.length, "").toArray
        if (matches(row)) { current = row; return true }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(outIdx.toSeq.map(i => UTF8String.fromString(current(i))))

  override def close(): Unit = reader.close()
}

private[sources] object PsvUtil {

  /** All data files under `path` (a directory or a single file), sorted for
    * deterministic partition order.
    */
  def paths(path: String): Seq[String] = {
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
          .filterNot(q => q.getName.startsWith("_") || q.getName.startsWith("."))
      else Seq(p)
    files.map(_.toString).sorted
  }

  def schemaOf(files: Seq[String]): StructType = {
    require(files.nonEmpty, "psv: no input files")
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())
    val p = new Path(files.head)
    val in = p.getFileSystem(conf).open(p)
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try {
      val header = Option(br.readLine()).getOrElse(
        throw new IllegalArgumentException(s"psv: empty file ${files.head}"))
      StructType(header.split('|').map(c => StructField(c, StringType, nullable = true)))
    } finally br.close()
  }
}
