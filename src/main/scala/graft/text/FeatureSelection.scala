package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chi-square (χ²) token–label association — the classic feature-selection
  * statistic for building quality/language/domain classifiers over a
  * corpus (Manning & Schütze ch. 5; the fastText-style pipeline's "which
  * tokens separate the classes" step).
  *
  * For each token t and a boolean document label, the 2×2 presence
  * contingency table is
  *
  * {{{
  *            label      ¬label
  *   t        a          b
  *   ¬t       c          d
  * }}}
  *
  * and χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
  *
  * Scale posture: one explode over documents (token presence is
  * `array_distinct`, so fan-out ≤ distinct tokens per doc), one
  * map-side-combinable groupBy on token, and the three corpus totals ride
  * along as a broadcast 1-row frame — no collect, no window. The counts
  * a/b/c/d are exact BIGINTs; χ² is IEEE-double arithmetic in a fixed
  * operation order over those exact longs, so the micro-rounded statistic
  * replays bit-exact in any IEEE-754 engine.
  */
object FeatureSelection {

  /** Per-token χ² against a boolean label.
    *
    * @param docs      one row per document
    * @param docIdCol  document id column name
    * @param tokensCol array-of-string column name (tokens per document;
    *                  de-duplicated internally — presence semantics)
    * @param labelCol  boolean column name
    * @param minDocs   drop tokens in fewer than this many documents
    *                  (and tokens present in EVERY document — zero
    *                  discriminative information, zero denominator)
    * @return (token, a, b, c, d, chi2_micro), one row per eligible token
    */
  def chiSquareTokens(docs: DataFrame, docIdCol: String, tokensCol: String,
      labelCol: String, minDocs: Long): DataFrame = {
    val base = docs.select(col(docIdCol).as("__id"),
      col(tokensCol).as("__toks"), col(labelCol).cast("boolean").as("__lab"))
    val totals = base.agg(
      count(lit(1)).as("__n"),
      sum(when(col("__lab"), 1L).otherwise(0L)).as("__pos"))
    val presence = base
      .select(col("__id"), col("__lab"),
        explode(array_distinct(col("__toks"))).as("token"))
    val perToken = presence.groupBy("token").agg(
      sum(when(col("__lab"), 1L).otherwise(0L)).as("a"),
      sum(when(col("__lab"), 0L).otherwise(1L)).as("b"))
    val d = (c: Column) => c.cast("double")
    perToken.crossJoin(broadcast(totals)) // 1-row totals frame
      .filter(col("a") + col("b") >= minDocs &&
        col("a") + col("b") < col("__n"))
      .select(col("token"), col("a"), col("b"),
        (col("__pos") - col("a")).as("c"),
        (col("__n") - col("__pos") - col("b")).as("d"),
        col("__n").as("__n"))
      .withColumn("__adbc",
        d(col("a")) * d(col("d")) - d(col("b")) * d(col("c")))
      .withColumn("__den",
        d(col("a") + col("b")) * d(col("c") + col("d")) *
          d(col("a") + col("c")) * d(col("b") + col("d")))
      .select(col("token"), col("a"), col("b"), col("c"), col("d"),
        when(col("__den") === 0.0, lit(0L)).otherwise(
          round(d(col("__n")) * col("__adbc") * col("__adbc") / col("__den")
            * 1e6).cast("long")).as("chi2_micro"))
  }
}
