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

  /** zlib compression ratio per document — the standard cheap redundancy
    * signal (boilerplate and template spam compress far better than prose;
    * pipelines drop documents whose ratio falls under a threshold). Runs as
    * a partition transform with one reused Deflater per partition (native
    * zlib state is expensive to create; reset() between rows is ~free).
    *
    * `ratio = deflated_bytes / utf8_bytes` — lower = more redundant. Spec-
    * tested for the ordering property (repetitive ≪ varied text) rather
    * than oracle-gated: deflate output bytes are zlib-version-specific, so
    * exact values are not an engine-portable contract.
    */
  def compressionRatio(df: DataFrame, textCol: String, idCol: String,
      level: Int = 6): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        df.schema(idCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("n_bytes",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("compressed_bytes",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("compression_ratio",
        org.apache.spark.sql.types.DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol), col(textCol)).mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(level)
      val buf = new Array[Byte](64 * 1024)
      rows.map { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        deflater.reset()
        deflater.setInput(in)
        deflater.finish()
        var out = 0
        while (!deflater.finished()) out += deflater.deflate(buf)
        val ratio = if (in.length == 0) 1.0 else out.toDouble / in.length
        org.apache.spark.sql.Row(r.get(0), in.length, out, ratio)
      }
    }(enc)
  }
}
