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

  /** Forward as-of join: for every left row, the single right row with
    * the SMALLEST `rightOn >= leftOn` in the key group (polars
    * `strategy="forward"`) — the "next quote after the event" lookup.
    * Same union-window shape as [[backward]] with time order reversed:
    * one shuffle on the key, O(|L|+|R|) rows. Ties among right rows at
    * the same timestamp resolve to the LARGEST `rightTieBreak`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOn: String,
      rightOn: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame =
    directional(left, right, keys, leftOn, rightOn, rightCols,
      rightTieBreak, tolerance, forwardDir = true)

  /** Nearest as-of join: backward and forward candidates computed over
    * ONE shuffled union (same hash partitioning, two sort orders —
    * Catalyst reuses the exchange), then the closer of the two wins;
    * equal distances resolve to the backward match. Tolerance, when
    * given, bounds the winning distance.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftOn: String,
      rightOn: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val u = unionFrame(left, right, keys, leftOn, rightOn, rightCols, rightTieBreak)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val d = distFn(left.schema(leftOn).dataType)
    val both = u
      .withColumn("__mb", last(col("__p"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__p"), ignoreNulls = true).over(wF))
    val db = d(col("__t"), col("__mb.__asof_t"))
    val df = d(col("__mf.__asof_t"), col("__t"))
    val win = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(db <= df, col("__mb"))
      .otherwise(col("__mf"))
    val dist = when(col("__mb").isNull, df)
      .when(col("__mf").isNull, db)
      .when(db <= df, db)
      .otherwise(df)
    val gated = tolerance match {
      case Some(tol) => when(dist <= tol.cast("long"), win)
      case None => win
    }
    both.withColumn("__m", gated)
      .filter(col("__side") === 1)
      .select(
        left.columns.map(col) ++
          rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Shared union construction: right rows carry (t, side=0, tie,
    * payload); left rows side=1 with null payload. Same inclusivity
    * convention as [[backward]] (right sorts before left at equal t in
    * BOTH directions — "at or before"/"at or after" inclusive).
    */
  private def unionFrame(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftOn: String, rightOn: String, rightCols: Seq[String],
      rightTieBreak: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    val clash = rightCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"rightCols collide with left columns: $clash")
    val payload = struct(
      (col(rightOn).as("__asof_t") +: rightCols.map(c => col(c).as(c))): _*)
    val tieStruct: Column =
      if (rightTieBreak.nonEmpty) struct(rightTieBreak.map(col): _*)
      else struct(lit(0).as("z"))
    val rightSel = right.select(
      keys.map(col) :+ col(rightOn).cast(left.schema(leftOn).dataType).as("__t") :+
        lit(0).as("__side") :+
        tieStruct.as("__tie") :+
        payload.as("__p"): _*)
    left
      .withColumn("__t", col(leftOn))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(rightSel.schema("__tie").dataType))
      .withColumn("__p", lit(null).cast(rightSel.schema("__p").dataType))
      .unionByName(rightSel, allowMissingColumns = true)
  }

  /** Signed time distance by axis type (same conventions as [[backward]]'s
    * tolerance arithmetic).
    */
  private def distFn(dt: org.apache.spark.sql.types.DataType): (Column, Column) => Column =
    dt match {
      case org.apache.spark.sql.types.DateType =>
        (a, b) => datediff(a, b).cast("long")
      case _: org.apache.spark.sql.types.TimestampType =>
        (a, b) => unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
      case _ => (a, b) => a.cast("long") - b.cast("long")
    }

  private def directional(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftOn: String, rightOn: String, rightCols: Seq[String],
      rightTieBreak: Seq[String], tolerance: Option[Column],
      forwardDir: Boolean): DataFrame = {
    if (tolerance.isDefined) {
      require(!left.schema(leftOn).dataType
        .isInstanceOf[org.apache.spark.sql.types.TimestampNTZType],
        "tolerance on a TimestampNTZ axis is ambiguous under DST; " +
          "convert to epoch micros (or a long axis) explicitly")
    }
    val u = unionFrame(left, right, keys, leftOn, rightOn, rightCols, rightTieBreak)
    val tOrd = if (forwardDir) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    val d = distFn(left.schema(leftOn).dataType)
    val dist =
      if (forwardDir) d(col("__m.__asof_t"), col("__t"))
      else d(col("__t"), col("__m.__asof_t"))
    val withinTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__m",
          when(col("__m").isNotNull && dist <= tol.cast("long"), col("__m")))
      case None => matched
    }
    withinTol
      .filter(col("__side") === 1)
      .select(
        left.columns.map(col) ++
          rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
