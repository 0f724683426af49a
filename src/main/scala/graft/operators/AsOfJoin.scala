package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed backward as-of join.
  *
  * Semantics of the reference's `polars.join_asof(strategy="backward")`
  * (reference storage/pipeline/collectors.py:764-784): for every left row,
  * attach the single right row with the greatest `rightOn <= leftOn` within
  * the same key group — including the right row's nulls (row semantics, not
  * per-column latest-non-null).
  *
  * Spark has no native as-of join; the classic range-join formulation
  * (`l JOIN r ON key AND r.t <= l.t` + window max) explodes to O(|L|·|R|)
  * per key before pruning. Instead we union both sides and take
  * `last(struct(right cols), ignoreNulls)` over a row-ordered window — one
  * shuffle on the key, O(|L|+|R|) rows, sort-based, spill-safe: this is the
  * shape that survives 100 TB.
  *
  * At equal timestamps the right row sorts BEFORE the left row (matching
  * "at or before" inclusivity). Ties among right rows at the same timestamp
  * are broken by `rightTieBreak` (latest wins) for cluster determinism.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOn: String,
      rightOn: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {

    require(rightCols.nonEmpty, "rightCols must be non-empty")
    val clash = rightCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"rightCols collide with left columns: $clash")

    val payload = struct(
      (col(rightOn).as("__asof_t") +: rightCols.map(c => col(c).as(c))): _*)

    // Tiebreak keeps NATIVE column types inside a struct (struct comparison
    // is field-wise typed ordering) — a string-concat tiebreak would order
    // numbers lexicographically ("9" > "10").
    val tieStruct: Column =
      if (rightTieBreak.nonEmpty) struct(rightTieBreak.map(col): _*)
      else struct(lit(0).as("z"))

    // Build the union manually so the payload/tie struct types are shared.
    val rightSel = right.select(
      keys.map(col) :+ col(rightOn).cast(left.schema(leftOn).dataType).as("__t") :+
        lit(0).as("__side") :+
        tieStruct.as("__tie") :+
        payload.as("__p"): _*)

    val leftSel = left
      .withColumn("__t", col(leftOn))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(rightSel.schema("__tie").dataType))
      .withColumn("__p", lit(null).cast(rightSel.schema("__p").dataType))

    val unioned = leftSel.unionByName(rightSel, allowMissingColumns = true)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))

    // Tolerance units by time-column type: DAYS for DateType, MICROSECONDS
    // for TimestampType (via unix_micros — a bare long cast of a timestamp
    // yields epoch SECONDS, a silent 10^6 unit error), otherwise the raw
    // long scale of the column (e.g. epoch nanos for a ts_ns axis).
    // TimestampNTZ is rejected: converting a wall clock to instants is
    // session-timezone dependent and off by the DST shift across
    // transitions — callers must supply an explicit epoch axis.
    if (tolerance.isDefined) {
      require(!left.schema(leftOn).dataType
        .isInstanceOf[org.apache.spark.sql.types.TimestampNTZType],
        "tolerance on a TimestampNTZ axis is ambiguous under DST; " +
          "convert to epoch micros (or a long axis) explicitly")
    }
    def dist(a: Column, b: Column): Column =
      left.schema(leftOn).dataType match {
        case org.apache.spark.sql.types.DateType => datediff(a, b).cast("long")
        case _: org.apache.spark.sql.types.TimestampType =>
          unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
        case _ => a.cast("long") - b.cast("long")
      }

    val withinTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__m",
          when(col("__m").isNotNull &&
            dist(col("__t"), col("__m.__asof_t")) <= tol.cast("long"),
            col("__m")))
      case None => matched
    }

    withinTol
      .filter(col("__side") === 1)
      .select(
        left.columns.map(col) ++
          rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
