package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score each raw-corpus document by how much more
  * likely a TARGET-domain unigram bag model finds it than the raw-corpus
  * model, then keep the top fraction — the standard cheap lever for
  * steering a 100 TB crawl toward a target distribution without training
  * a classifier.
  *
  * Engine exactness (the TfIdf/Perplexity discipline): the two add-one-
  * smoothed log-probabilities are micro-rounded ONCE per distinct
  * vocabulary token — `round(ln(p)·10⁶)` — so every per-document score is
  * an exact integer sum of per-token deltas and replays bit-identically
  * in SQL; no float aggregate ever depends on summation order.
  *
  * Scale posture: token counting is explode + groupBy (shuffle on the
  * token key); the weight table is vocabulary-sized and joins the scoring
  * pass on the token key (AQE broadcasts it while it is small); selection
  * is threshold-based — the exact k-th-largest score is found on the
  * map-side-combined score HISTOGRAM (distinct-score-sized, never the
  * corpus) and the corpus is then FILTERED, so no single task ever
  * materializes a corpus-proportional top-k heap. Nothing driver-sized
  * except the corpus total and the two threshold scalars (one-row
  * aggregates).
  */
object ImportanceResampling {

  private def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))

  /** Per-token importance deltas over the SHARED vocabulary
    * (target ∪ raw): (tok, delta_micro) with
    * delta_micro = round(ln((ct+1)/(Tt+V))·1e6) − round(ln((cr+1)/(Tr+V))·1e6).
    */
  def weights(target: DataFrame, raw: DataFrame, textCol: String): DataFrame = {
    val tt = tokenCounts(target, textCol).withColumnRenamed("c", "ct")
    val rt = tokenCounts(raw, textCol).withColumnRenamed("c", "cr")
    val vocab = tt.join(rt, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    // corpus totals + vocab size: one-row aggregate, broadcast-crossed
    val totals = vocab.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"),
      count(lit(1)).as("v"))
    def logpMicro(c: Column, tot: Column, v: Column): Column =
      round(log((c + 1).cast("double") / (tot + v).cast("double")) * 1e6)
        .cast("long")
    vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        (logpMicro(col("ct"), col("tt"), col("v")) -
          logpMicro(col("cr"), col("tr"), col("v"))).as("delta_micro"))
  }

  /** Per-document importance score: Σ count_w(doc) · delta_micro(w).
    * Tokens absent from the weight table contribute 0 (documented OOV
    * rule — scoring the corpus the weights were fit on has none).
    * @return (id, n_tokens, score_micro)
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
    toks.join(weights, Seq("tok"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("delta_micro"), lit(0L))).as("score_micro"))
  }

  /** Deterministic top-fraction selection: keep the ⌈fraction·N⌉ highest
    * scores (ties → smallest id) — the deterministic counterpart of the
    * paper's Gumbel resample.
    *
    * NOT `orderBy().limit(k)`: with k ∝ corpus that plans
    * TakeOrderedAndProject — per-partition heaps of size k merged in ONE
    * final task, i.e. `fraction` of the whole corpus materialized on a
    * single executor (SparkEntrySpec now bans the pattern globally).
    * Instead the exact k-th-largest score is read off the score HISTOGRAM
    * — `groupBy(score)` map-side-combines, so only distinct scores cross
    * the shuffle, and a [[GlobalOrder]] two-phase prefix sum over the
    * descending histogram yields cumulative counts without a global
    * window. Selection is then a full-scan FILTER (`score > t`) plus a
    * boundary top-up resolved by the (score, id) tie rule — the boundary
    * itself via a distributed row number, so even an all-ties corpus
    * never funnels through one task.
    */
  def select(scored: DataFrame, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0, 1]")
    // four consumers below (count, histogram, kept filter, boundary) —
    // materialize the scoring pipeline ONCE instead of re-running the
    // tokenize→join→agg chain per consumer (measured 2.8 s → ~1.2 s at
    // sf0.1; at corpus scale the caller would persist `scored` anyway)
    val sc = Materialize.once(scored)
    val n = sc.count() // one scalar — the corpus total
    if (n == 0) return sc
    val k = math.ceil(n * fraction).toLong
    val hist = sc.groupBy(col("score_micro")).agg(count(lit(1)).as("__c"))
    val cum = GlobalOrder.runningSum(
      hist.withColumn("__negs", -col("score_micro")),
      Seq("__negs"), col("__c"), "__cum")
    // the k-th largest score = first score (descending) whose cumulative
    // count reaches k; `above` = rows strictly better than it. One
    // two-scalar driver row — dimension-sized by construction.
    val thr = cum.filter(col("__cum") >= k)
      .agg(min_by(struct(col("score_micro").as("t"),
        (col("__cum") - col("__c")).as("above")), col("__cum")).as("b"))
      .select(col("b.t"), col("b.above")).first()
    val t = thr.getLong(0)
    val m = k - thr.getLong(1) // boundary rows to keep, ties → smallest id
    val kept = sc.filter(col("score_micro") > t)
    val boundary = GlobalOrder.runningRowNumber(
        sc.filter(col("score_micro") === t), Seq("id"), "__rn")
      .filter(col("__rn") <= m).drop("__rn")
    kept.unionByName(boundary)
  }
}
