package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher/MassiveText-style repetition and shape filters (Rae et al. 2021,
  * table A1): per-document statistics whose thresholds gate a pre-training
  * corpus. All stats are count ratios — integer counts divided as doubles —
  * so results are bit-identical across engines and partitionings (no
  * transcendentals, no float sums).
  *
  * Scale design: one explode of the token stream feeds BOTH histogram
  * passes (unigram and bigram) as groupBy aggregations with map-side
  * combine; the per-document reduction shuffles on doc id only. No window
  * functions, no driver-side state.
  */
object QualityFilters {

  /** Per-document stats + pass flag:
    *  - n_tokens, mean_word_len
    *  - top_word_frac: most-common token's share of all tokens
    *  - dup_bigram_frac: share of bigram occurrences whose bigram occurs
    *    more than once (repetitiousness)
    *  - alpha_word_frac: share of tokens containing an alphabetic char
    *  - pass: the Gopher-style gate
    *    (3 ≤ mean_word_len ≤ 10, top_word_frac ≤ 0.30,
    *     dup_bigram_frac ≤ 0.40, alpha_word_frac ≥ 0.80, n_tokens ≥ 8)
    */
  def gopherStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))

    val uni = toks.groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        max(col("c")).as("top_word_c"),
        sum(length(col("tok")) * col("c")).as("char_sum"),
        sum(when(col("tok").rlike("[a-z]"), col("c")).otherwise(lit(0L)))
          .as("alpha_c"))

    // Bigrams from the same exploded stream: pair each token with its
    // successor via a per-doc window would shuffle per token — instead
    // rebuild from the array form (cheap: one transform, no extra shuffle).
    val bi = df.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("id"), explode(
        when(size(col("t")) >= 2,
          transform(sequence(lit(0), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .otherwise(array())).as("bg"))
      .groupBy(col("id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_bigram_c"))

    uni.join(bi, Seq("id"), "left")
      .select(
        col("id"),
        col("n_tokens"),
        (col("char_sum").cast("double") / col("n_tokens")).as("mean_word_len"),
        (col("top_word_c").cast("double") / col("n_tokens")).as("top_word_frac"),
        (coalesce(col("dup_bigram_c"), lit(0L)).cast("double") /
          coalesce(col("n_bigrams"), lit(1L))).as("dup_bigram_frac"),
        (col("alpha_c").cast("double") / col("n_tokens")).as("alpha_word_frac"))
      .withColumn("pass",
        (col("mean_word_len").between(3.0, 10.0) &&
          col("top_word_frac") <= 0.30 &&
          col("dup_bigram_frac") <= 0.40 &&
          col("alpha_word_frac") >= 0.80 &&
          col("n_tokens") >= 8).cast("int"))
  }
}
