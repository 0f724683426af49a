package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastText-style linear classifier scoring over a hashed bag of words —
  * the shape of model-based quality filtering (e.g. a CCNet/LLaMA-style
  * "looks like Wikipedia" scorer) run as a pure map over the corpus.
  *
  * The feature space is the hashing trick: token → md5-prefix bucket in
  * [0, nBuckets). Weights are a fixed, data-independent integer formula
  * (a trained model would broadcast a weight array instead — the plumbing
  * is identical), kept in integer micro-units so the per-document score is
  * an EXACT integer sum: no float accumulation order to desync engines, no
  * shuffle at all — score + threshold is one narrow map stage feeding a
  * per-document aggregate.
  *
  * Scale: tokenization + hashing + weight lookup are per-row expression
  * work (whole-stage codegen'd, no UDF); the only shuffle is the final
  * groupBy(id), pre-combined map-side. A real trained model swaps
  * [[weightMicro]] for `element_at(broadcast weights, bucket)` — same plan.
  */
object HashedClassifier {

  /** md5-prefix feature bucket in [0, nBuckets) — portable across engines
    * (same formula as [[graft.operators.Assembly.stratifiedSampleByHash]]).
    */
  def bucket(token: Column, nBuckets: Int): Column =
    conv(substring(md5(token.cast("binary")), 1, 8), 16, 10)
      .cast("long") % nBuckets

  /** Deterministic pseudo-weight for a bucket, integer micro-units in
    * (-1e6, 1e6]: Knuth-multiplicative scramble of the bucket id, reduced
    * mod 2e6 and centered. Pure 64-bit integer arithmetic — bit-identical
    * in any engine.
    */
  def weightMicro(bucket: Column, seed: Long): Column =
    (bucket * 2654435761L + lit(seed) * 97L + 13L) % 2000000L - 1000000L

  /** Per-document linear score: (id, n_tokens, score_micro, avg_score,
    * label). score_micro = Σ_tokens w_micro(bucket(token)) exactly;
    * avg_score = score_micro / 1e6 / n_tokens (one IEEE division chain);
    * label = avg_score > 0.
    */
  def score(df: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 1024, seed: Long = 7L): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    graft.operators.Parallelism.spreadBy(df, col(idCol))
      .select(col(idCol).as("id"), explode(toks).as("tok"))
      .select(col("id"), weightMicro(bucket(col("tok"), nBuckets), seed).as("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score_micro"))
      .withColumn("avg_score", col("score_micro") / 1e6 / col("n_tokens"))
      .withColumn("label", (col("avg_score") > 0d).cast("int"))
  }
}
