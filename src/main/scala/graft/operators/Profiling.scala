package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style column profiling: one long-form row per profiled column
  * with null counts, exact distinct counts, and type-aware extremes —
  * the data-quality report a curation pipeline runs before trusting a new
  * source drop.
  *
  * Single job, single scan: all per-column aggregates are computed in ONE
  * `agg` row and unpivoted driver-side into long form (the wide row is one
  * row — the unpivot is free). Multiple exact `countDistinct`s make
  * Catalyst plan one Expand (×|cols| row replication through one shuffle) —
  * the price of exact ANALYZE semantics; the 100 TB variant swaps in
  * `approx_count_distinct` (HLL++, q47) per column with zero Expand, same
  * shape otherwise.
  *
  * Extremes are emitted in engine-exact form: numeric min/max as
  * micro-scaled BIGINT (`round(v·1e6)` per value, then min/max — exact and
  * replayable), string min/max as lengths plus a total length sum. Columns
  * of other types profile as counts only (extremes null).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val n = count(lit(1))
    val aggs = cols.flatMap { c =>
      val base = Seq(
        n.as(s"__${c}__rows"),
        (n - count(col(c))).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__distinct"))
      val extremes = types(c) match {
        case _: NumericType =>
          val micro = round(col(c).cast("double") * 1e6).cast("long")
          Seq(min(micro).as(s"__${c}__min_micro"),
            max(micro).as(s"__${c}__max_micro"),
            lit(null).cast("long").as(s"__${c}__min_len"),
            lit(null).cast("long").as(s"__${c}__max_len"),
            lit(null).cast("long").as(s"__${c}__len_sum"))
        case StringType =>
          Seq(lit(null).cast("long").as(s"__${c}__min_micro"),
            lit(null).cast("long").as(s"__${c}__max_micro"),
            min(length(col(c))).cast("long").as(s"__${c}__min_len"),
            max(length(col(c))).cast("long").as(s"__${c}__max_len"),
            sum(length(col(c))).cast("long").as(s"__${c}__len_sum"))
        case _ =>
          Seq(lit(null).cast("long").as(s"__${c}__min_micro"),
            lit(null).cast("long").as(s"__${c}__max_micro"),
            lit(null).cast("long").as(s"__${c}__min_len"),
            lit(null).cast("long").as(s"__${c}__max_len"),
            lit(null).cast("long").as(s"__${c}__len_sum"))
      }
      base ++ extremes
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val fields = Seq("rows", "nulls", "distinct", "min_micro", "max_micro",
      "min_len", "max_len", "len_sum")
    val longForm = explode(array(cols.map { c =>
      struct(lit(c).as("col_name") +:
        fields.map(f => col(s"__${c}__$f").as(f)): _*)
    }: _*))
    wide.select(longForm.as("p")).select(
      $"p.col_name".as("col_name"), $"p.rows".as("n_rows"),
      $"p.nulls".as("n_null"), $"p.distinct".as("n_distinct"),
      $"p.min_micro".as("min_micro"), $"p.max_micro".as("max_micro"),
      $"p.min_len".as("min_len"), $"p.max_len".as("max_len"),
      $"p.len_sum".as("len_sum"))
  }
}
