package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** DRIVER-SIDE parquet I/O for the stats sidecar — the per-commit fast
  * path. A sidecar is one row per live file (manifest-sized, kilobytes);
  * routing it through Spark cost a read, two joins and a one-task write
  * JOB per commit — ~0.3-0.5 s of planning/scheduling per landed version,
  * the dominant per-commit constant the round-14 bench surfaced on
  * q89/q90/q108. This module reads and writes the same directory layout
  * with parquet-hadoop's example Group API (already the engine's
  * driver-side footer idiom, see `stageFreshStats`): pure driver I/O,
  * zero Spark jobs.
  *
  * Scope is deliberately narrow: flat schemas of
  * string/long/int/double/float/boolean/date columns — everything a
  * sidecar can contain for the supported stats-column types. Any other
  * shape returns None/false and the caller falls back to the Spark path
  * (correct for exotic stats columns, just slower). Files written here
  * are ordinary optional-primitive parquet: `spark.read.parquet` and the
  * existing `SidecarSkip.load` consume them unchanged.
  */
private[lake] object SidecarIO {

  def supported(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case StringType | LongType | IntegerType | DoubleType | FloatType |
           BooleanType | DateType => true
      case _ => false
    })

  private def toParquet(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: Type = f.dataType match {
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case LongType => Types.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      b.addField(t)
    }
    b.named("sidecar")
  }

  /** Parquet primitive → Spark type, or None when outside the supported
    * set (caller falls back to Spark). */
  private def toSpark(t: Type): Option[DataType] = {
    if (!t.isPrimitive) return None
    val p = t.asPrimitiveType()
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case PrimitiveTypeName.BINARY
          if ann == LogicalTypeAnnotation.stringType() => Some(StringType)
      case PrimitiveTypeName.INT64 if ann == null => Some(LongType)
      case PrimitiveTypeName.INT32
          if ann == LogicalTypeAnnotation.dateType() => Some(DateType)
      case PrimitiveTypeName.INT32 if ann == null => Some(IntegerType)
      case PrimitiveTypeName.DOUBLE => Some(DoubleType)
      case PrimitiveTypeName.FLOAT => Some(FloatType)
      case PrimitiveTypeName.BOOLEAN => Some(BooleanType)
      case _ => None
    }
  }

  /** Read every `*.parquet` part under `dir` into external Rows. None when
    * the directory holds anything the narrow schema set can't represent
    * (or differs across parts) — the caller then reads through Spark.
    */
  def read(conf: Configuration, dir: Path): Option[(StructType, Seq[Row])] = {
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Some((StructType(Nil), Seq.empty))
    val parts = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    if (parts.isEmpty) return Some((StructType(Nil), Seq.empty))
    var schema: Option[StructType] = None
    val rows = Seq.newBuilder[Row]
    for (part <- parts) {
      val in = HadoopInputFile.fromPath(part.getPath, conf)
      val footer = ParquetFileReader.open(in)
      val msg = try footer.getFooter.getFileMetaData.getSchema
        finally footer.close()
      val fields = (0 until msg.getFieldCount).map(msg.getType)
      val sparkFields = fields.map(f => toSpark(f).map(dt =>
        StructField(f.getName, dt)))
      if (sparkFields.exists(_.isEmpty)) return None
      val st = StructType(sparkFields.map(_.get))
      if (schema.exists(_ != st)) return None
      schema = Some(st)
      val reader = ParquetReader
        .builder(new GroupReadSupport(), part.getPath).withConf(conf).build()
      try {
        var g: Group = reader.read()
        while (g != null) {
          rows += Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
            if (g.getFieldRepetitionCount(i) == 0) null
            else f.dataType match {
              case StringType => g.getString(i, 0)
              case LongType => g.getLong(i, 0)
              case IntegerType => g.getInteger(i, 0)
              case DoubleType => g.getDouble(i, 0)
              case FloatType => g.getFloat(i, 0)
              case BooleanType => g.getBoolean(i, 0)
              case DateType =>
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
                  g.getInteger(i, 0).toLong))
              case other => throw new IllegalStateException(s"$other")
            }
          }.toIndexedSeq)
          g = reader.read()
        }
      } finally reader.close()
    }
    schema.map((_, rows.result()))
  }

  /** Write `rows` as a single-part parquet DIRECTORY at `dir` (the same
    * layout Spark's `coalesce(1).write.parquet` produces, minus the
    * `_SUCCESS` marker). False when the schema is outside the supported
    * set — nothing is written and the caller falls back to Spark.
    */
  def write(conf: Configuration, dir: Path, schema: StructType,
      rows: Seq[Row]): Boolean = {
    if (!supported(schema)) return false
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val msg = toParquet(schema)
    val factory = new SimpleGroupFactory(msg)
    val c = new Configuration(conf)
    GroupWriteSupport.setSchema(msg, c)
    val writer: ParquetWriter[Group] = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(
        new Path(dir, "part-00000-sidecar.parquet"), c))
      .withConf(c)
      .build()
    try {
      rows.foreach { r =>
        val g = factory.newGroup()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = r.get(i)
          if (v != null) f.dataType match {
            case StringType => g.append(f.name, v.asInstanceOf[String])
            case LongType => g.append(f.name, v.asInstanceOf[Long])
            case IntegerType => g.append(f.name, v.asInstanceOf[Int])
            case DoubleType => g.append(f.name, v.asInstanceOf[Double])
            case FloatType => g.append(f.name, v.asInstanceOf[Float])
            case BooleanType => g.append(f.name, v.asInstanceOf[Boolean])
            case DateType => g.append(f.name,
              v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
            case other => throw new IllegalStateException(s"$other")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
    true
  }

  /** `unionByName(allowMissingColumns = true)` over driver rows: the
    * merged column set in first-seen order; absent columns read null.
    * None when one name carries two different types (the Spark path would
    * need a cast — fall back).
    */
  def unionByName(parts: Seq[(StructType, Seq[Row])])
      : Option[(StructType, Seq[Row])] = {
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    for ((st, _) <- parts; f <- st.fields) fields.get(f.name) match {
      case None => fields(f.name) = f
      case Some(prev) if prev.dataType != f.dataType => return None
      case _ =>
    }
    val schema = StructType(fields.values.toSeq)
    val rows = parts.flatMap { case (st, rs) =>
      val idx = st.fieldNames.zipWithIndex.toMap
      rs.map(r => Row.fromSeq(schema.fields.map(f =>
        idx.get(f.name).map(r.get).orNull).toIndexedSeq))
    }
    Some((schema, rows))
  }
}
