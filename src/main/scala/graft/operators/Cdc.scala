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

  /** Append the seq-tracking columns [[mergeStateful]] needs to a seed
    * snapshot: one `__seq_<c>` per seq column (typed from `ops`, null =
    * "no op applied yet", which any real op's seq beats) plus a false
    * `__deleted` tombstone flag.
    */
  def seedState(base: DataFrame, ops: DataFrame, seqCols: Seq[String]): DataFrame =
    seqCols.foldLeft(base) { case (df, c) =>
      df.withColumn(s"__seq_$c", lit(null).cast(ops.schema(c).dataType))
    }.withColumn("__deleted", lit(false))

  /** The user-facing rows of a [[mergeStateful]] state: tombstones dropped,
    * bookkeeping columns removed. */
  def currentView(state: DataFrame): DataFrame =
    state.filter(!col("__deleted"))
      .drop(state.columns.filter(c =>
        c.startsWith("__seq_") || c == "__deleted").toSeq: _*)

  /** Seq-aware merge for INCREMENTAL application. [[merge]] assumes `ops`
    * is the COMPLETE log, so last-writer-wins within the call is global
    * last-writer-wins; applied batch-by-batch that breaks — an op arriving
    * in a later batch with a LOWER seq would overwrite a newer value the
    * previous batch already applied. This variant carries each key's
    * winning seq in the state (`__seq_<c>` columns, from [[seedState]])
    * and applies an op only when its seq exceeds the stored seq — true
    * MERGE INTO semantics under out-of-order multi-batch delivery.
    * Deletes become TOMBSTONES (row kept, `__deleted` = true, seq
    * retained) so a late lower-seq upsert cannot resurrect a deleted key;
    * a late HIGHER-seq upsert legitimately does. Read the final table via
    * [[currentView]]. Same scale shape as [[merge]]: one window + one
    * full-outer equi-join, both partitioned on the key.
    */
  def mergeStateful(state: DataFrame, ops: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String, deleteOp: String,
      valueCols: Map[String, Column]): DataFrame = {
    val last = compact(ops, keyCols, seqCols).select(
      keyCols.map(col) ++
        Seq(col(opCol).as("__op")) ++
        seqCols.map(c => col(c).as(s"__opseq_$c")) ++
        valueCols.map { case (name, e) => e.as(s"__new_$name") }: _*)
    val joined = state.join(last, keyCols, "full_outer")
    // lexicographic seq comparison via struct ordering; a null stored seq
    // (seed row, never touched) loses to any op
    val opSeq = struct(seqCols.map(c => col(s"__opseq_$c")): _*)
    val stSeq = struct(seqCols.map(c => col(s"__seq_$c")): _*)
    val opWins = col("__op").isNotNull &&
      (col(s"__seq_${seqCols.head}").isNull || opSeq > stSeq)
    val userCols = state.columns.filterNot(c =>
      c.startsWith("__seq_") || c == "__deleted")
    val outCols = userCols.map { c =>
      if (valueCols.contains(c))
        when(opWins, col(s"__new_$c")).otherwise(col(c)).as(c)
      else col(c)
    } ++ seqCols.map { c =>
      when(opWins, col(s"__opseq_$c")).otherwise(col(s"__seq_$c")).as(s"__seq_$c")
    } :+ when(opWins, col("__op") === deleteOp)
      .otherwise(coalesce(col("__deleted"), lit(false))).as("__deleted")
    joined.select(outCols.toSeq: _*)
  }
}
