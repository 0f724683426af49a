package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the MERGE INTO primitive: compact an
  * ordered ops log (upserts + deletes) to its last-writer-wins state and
  * merge it into a base snapshot. The non-temporal sibling of the SCD-2
  * maintenance in [[graft.master.SecurityMaster]] (which keeps history;
  * this produces the current state the reference's read-modify-write
  * cycle rebuilds per partition — storage/handlers/ticks.py:209-347's
  * filter-existing-then-append loop, generalized to deletes).
  *
  * Scale design: compaction is one key-partitioned window (max-seq row
  * per key — the dedup-latest shape, partial-agg friendly); the merge is
  * ONE full-outer equi-join on the key. Neither side is ever collected,
  * globally windowed, or re-shuffled twice: base and compacted ops hash-
  * partition on the same key, so AQE plans a single exchange per side.
  * Deletes drop rows; upserts replace; unmatched base rows carry over.
  */
object Cdc {

  /** Last-writer-wins compaction: one row per key — the highest
    * `seqCols` row (ties broken by the LAST seq column, which the caller
    * must make unique per key). Keeps all ops columns, including the op
    * marker, so callers can route deletes.
    */
  def compact(ops: DataFrame, keyCols: Seq[String], seqCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(col(_).desc): _*)
    ops.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge a compacted-or-raw ops log into `base`. `valueCols` maps the
    * base column to the ops expression that replaces it on upsert; rows
    * whose last op is `deleteOp` are dropped; base rows without ops carry
    * over unchanged. Returns the base schema plus `__changed` (1 when an
    * upsert touched the row, 0 for carry-over).
    */
  def merge(base: DataFrame, ops: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String, deleteOp: String,
      valueCols: Map[String, Column]): DataFrame = {
    val last = compact(ops, keyCols, seqCols)
      .select((keyCols.map(col) :+ col(opCol).as("__op")) ++
        valueCols.map { case (name, e) => e.as(s"__new_$name") }: _*)
    val joined = base.join(last, keyCols, "full_outer")
    val isDelete = col("__op") === deleteOp
    val isUpsert = col("__op").isNotNull && !isDelete
    val outCols = base.columns.map { c =>
      if (valueCols.contains(c)) when(isUpsert, col(s"__new_$c")).otherwise(col(c)).as(c)
      else col(c)
    }
    joined
      .filter(!coalesce(isDelete, lit(false)))       // drop deleted keys
      // an op on a key absent from base: pure insert — requires every
      // non-key base column to come from valueCols or stay null
      .select(outCols.toSeq :+ isUpsert.cast("int").as("__changed"): _*)
  }
}
