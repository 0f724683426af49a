package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Logical→physical column mapping — the Delta `columnMapping.mode=name`
  * idea restated on the manifest schema: every field MAY carry a
  * `graft.physical` metadata entry naming the column as it appears in the
  * parquet files. Absent metadata means physical == logical (the state of
  * every table until its first RENAME), so unmapped tables pay nothing
  * and change nothing.
  *
  * The invariants that make this sound:
  *  - a column's PHYSICAL name is assigned at its first commit (its
  *    logical name then) and NEVER changes — renames move only the
  *    logical name, so every live file, old or new, stores the column
  *    under one name;
  *  - every data write translates logical→physical before touching
  *    parquet ([[Snapshots]] stage paths), and every read translates
  *    back, so files written before and after a rename are byte-layout
  *    compatible;
  *  - delete vectors and stats sidecars are keyed by PHYSICAL names
  *    (stable across renames) — pre-mapping artifacts already satisfy
  *    this, because physical == logical back then;
  *  - PARTITION columns cannot be renamed or dropped (their physical
  *    name is baked into every directory path);
  *  - a DROPPED column's physical name is retired
  *    (`Manifest.droppedPhysical`): the bytes stay on disk for older
  *    versions, and re-using the name for a NEW column is refused until
  *    a compact rewrites the live files (otherwise old bytes would
  *    resurrect under the new column).
  */
object ColumnMapping {

  val PhysicalKey = "graft.physical"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** Does any field map to a physical name different from its logical? */
  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** logical name → physical name, identity entries included. */
  def physicalOf(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  /** physical name → logical name, identity entries included. */
  def logicalOf(schema: StructType): Map[String, String] =
    schema.fields.map(f => physicalName(f) -> f.name).toMap

  /** The schema as the parquet files spell it: fields renamed to their
    * physical names, mapping metadata dropped (a physical schema maps
    * nothing), every other metadata entry kept.
    */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      f.copy(name = physicalName(f), metadata = withoutKey(f.metadata))
    })

  /** Rename `df`'s columns logical→physical per `schema` (columns absent
    * from `schema` — e.g. a commit introducing NEW columns — keep their
    * names: a new column's physical name IS its logical name).
    */
  def toPhysical(df: DataFrame, schema: StructType): DataFrame = {
    val phys = physicalOf(schema)
    if (df.columns.forall(c => phys.getOrElse(c, c) == c)) df
    else df.toDF(df.columns.map(c => phys.getOrElse(c, c)).toIndexedSeq: _*)
  }

  /** Mark `f` as stored under `physical`. */
  def withPhysical(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalKey, physical).build())

  private def withoutKey(m: Metadata): Metadata =
    if (!m.contains(PhysicalKey)) m
    else {
      val b = new MetadataBuilder().withMetadata(m).remove(PhysicalKey)
      b.build()
    }

  /** Strip all mapping metadata — the schema of a full rewrite (compact)
    * whose files materialize the logical names.
    */
  def unmapped(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(metadata = withoutKey(f.metadata))))
}
