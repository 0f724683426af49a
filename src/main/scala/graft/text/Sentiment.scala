package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactAgg

/** Filing sentiment pipeline (T4 + A9 — reference derived/sentiment.py and
  * models/base.py:33-77).
  *
  * [[SentimentModel]] is the inference seam: the reference runs FinBERT
  * (non-JVM, GPU); here the default is a deterministic lexicon scorer so the
  * pipeline is hermetic. A production implementation would call an external
  * inference service inside `mapPartitions` with the same contract
  * (chunk text in → label + confidence out) without touching the plan.
  */
trait SentimentModel {
  def name: String
  def version: String

  /** Add (label ∈ positive|negative|neutral, score ∈ [0,1]) to chunk rows. */
  def score(chunks: DataFrame, textCol: String): DataFrame
}

/** Deterministic word-list scorer: label by positive-vs-negative hit counts,
  * confidence = margin / total hits (0.5 when no hits → neutral).
  */
class LexiconSentimentModel(
    positive: Seq[String] = WordLists.positive,
    negative: Seq[String] = WordLists.negative) extends SentimentModel {
  override val name = "lexicon"
  override val version = "1.0"

  override def score(chunks: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val pos = size(filter(toks, t => t.isInCollection(positive)))
    val neg = size(filter(toks, t => t.isInCollection(negative)))
    chunks
      .withColumn("__pos", pos).withColumn("__neg", neg)
      .withColumn("label",
        when(col("__pos") > col("__neg"), "positive")
          .when(col("__neg") > col("__pos"), "negative")
          .otherwise("neutral"))
      .withColumn("score",
        when(col("__pos") + col("__neg") === 0, 0.5)
          .otherwise(abs(col("__pos") - col("__neg")).cast("double") /
            (col("__pos") + col("__neg"))))
      .drop("__pos", "__neg")
  }
}

object Sentiment {

  /** Chunk a filing corpus: (idCols..., chunk_idx, chunk) rows. */
  def chunk(filings: DataFrame, textCol: String, idCols: Seq[String],
      chunkSize: Int = 1500, overlap: Int = 200): DataFrame =
    filings.select(
      idCols.map(col) :+
        posexplode(Chunker.chunksUdf(chunkSize, overlap)(col(textCol)))
          .as(Seq("chunk_idx", "chunk")): _*)

  /** A9 — aggregate scored chunks to per-filing sentiment metrics, matching
    * reference _aggregate_sentiment_results (sentiment.py:175-299):
    * chunk sentiment = +score | -score | 0; mean, SAMPLE stddev, range,
    * Pearson skew (mean-median)/std, extreme-negative ratio (< -0.5),
    * label ratios, average per-label confidences, confidence stddev;
    * all rounded to 4dp as the reference does.
    *
    * Exactness: stddev via integer-moment variance (deterministic under any
    * aggregation order), median via exact interpolated percentile.
    */
  def aggregate(scored: DataFrame, idCols: Seq[String]): DataFrame = {
    val sent = when(col("label") === "positive", col("score"))
      .when(col("label") === "negative", -col("score"))
      .otherwise(0.0)
    val s = scored.withColumn("__sent", sent)
    val n = count(lit(1))
    def r4(c: Column): Column = round(c, 4)

    // order-independent means: fixed-point sums (ExactAgg) instead of
    // sum(double) — reduction order is nondeterministic on a cluster
    def fixedMean(c: Column, cnt: Column): Column =
      ExactAgg.fixedSum(c, 6) / cnt

    val grouped = s.groupBy(idCols.map(col): _*).agg(
      n.as("chunk_count"),
      r4(fixedMean(col("__sent"), n)).as("sentiment_score"),
      r4(count(when(col("label") === "positive", 1)).cast("double") / n).as("positive_ratio"),
      r4(count(when(col("label") === "negative", 1)).cast("double") / n).as("negative_ratio"),
      r4(count(when(col("label") === "neutral", 1)).cast("double") / n).as("neutral_ratio"),
      r4(coalesce(fixedMean(when(col("label") === "positive", col("score")),
        count(when(col("label") === "positive", 1))), lit(0.0)))
        .as("avg_positive_confidence"),
      r4(coalesce(fixedMean(when(col("label") === "negative", col("score")),
        count(when(col("label") === "negative", 1))), lit(0.0)))
        .as("avg_negative_confidence"),
      when(n > 1, r4(ExactAgg.fixedStddevSamp(col("__sent"), 6))).otherwise(0.0)
        .as("sentiment_std"),
      when(n > 1, r4(max(col("__sent")) - min(col("__sent")))).otherwise(0.0)
        .as("sentiment_range"),
      fixedMean(col("__sent"), n).as("__mean"),
      expr("percentile(__sent, 0.5)").as("__median"),
      when(n > 1, r4(ExactAgg.fixedStddevSamp(col("score"), 6))).otherwise(0.0)
        .as("confidence_std"),
      r4(count(when(col("__sent") < -0.5, 1)).cast("double") / n).as("extreme_negative_ratio"))

    grouped
      .withColumn("sentiment_skew",
        when(col("chunk_count") > 1 && col("sentiment_std") > 0,
          round((col("__mean") - col("__median")) / col("sentiment_std"), 4))
          .otherwise(0.0))
      .drop("__mean", "__median")
  }

  /** End-to-end: filings → chunks → model scores → per-filing metrics +
    * LM word ratios and readability over the full text.
    */
  def pipeline(filings: DataFrame, textCol: String, idCols: Seq[String],
      model: SentimentModel = new LexiconSentimentModel(),
      chunkSize: Int = 1500, overlap: Int = 200): DataFrame = {
    val chunks = chunk(filings, textCol, idCols, chunkSize, overlap)
    val scored = model.score(chunks, "chunk")
    val agg = aggregate(scored, idCols)
    val textMetrics = filings.select(
      idCols.map(col) ++ Seq(
        length(col(textCol)).as("text_length"),
        WordLists.ratios(col(textCol)).as("__wr"),
        Readability.avgSentenceLengthUdf(col(textCol)).as("avg_sentence_length"),
        Readability.fogIndexUdf(col(textCol)).as("fog_index")): _*)
      .select(
        idCols.map(col) ++ Seq(
          col("text_length"), col("avg_sentence_length"), col("fog_index"),
          col("__wr.word_count").as("word_count"),
          col("__wr.uncertainty_ratio").as("uncertainty_ratio"),
          col("__wr.litigious_ratio").as("litigious_ratio"),
          col("__wr.constraining_ratio").as("constraining_ratio"),
          col("__wr.weak_modal_ratio").as("weak_modal_ratio"),
          col("__wr.strong_modal_ratio").as("strong_modal_ratio")): _*)
    agg.join(textMetrics, idCols)
      .withColumn("model_name", lit(model.name))
      .withColumn("model_version", lit(model.version))
  }
}
