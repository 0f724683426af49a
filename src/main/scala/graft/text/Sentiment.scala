package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
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

/** Partition-batched inference seam — the worked example for plugging a
  * real model (external service, per-executor ONNX session, …) into the
  * pipeline. Mirrors the reference's serving shape (sentiment handler:
  * batch 32 fed from a bounded prefetch queue of 512 texts,
  * handlers/sentiment.py:356-444): inside `mapPartitions`, a daemon thread
  * drains the upstream iterator (parquet decode / shuffle fetch) into a
  * bounded batch queue while the task thread runs [[scoreBatch]] — input
  * I/O overlaps model compute, and the queue bound caps memory at
  * ~`prefetchDepth` in-flight rows per task.
  *
  * Implementations override ONLY [[scoreBatch]]; model state should live in
  * a lazy `@transient` field so it is constructed once per executor JVM,
  * never serialized from the driver.
  */
abstract class BatchSentimentModel(
    val batchSize: Int = 32, val prefetchDepth: Int = 512)
    extends SentimentModel with Serializable {

  /** One model invocation: a batch of chunk texts in, (label ∈
    * positive|negative|neutral, confidence ∈ [0,1]) per text out, in order.
    */
  def scoreBatch(texts: Seq[String]): Seq[(String, Double)]

  override def score(chunks: DataFrame, textCol: String): DataFrame = {
    val idx = chunks.schema.fieldIndex(textCol)
    val enc = Encoders.row(
      chunks.schema.add("label", StringType).add("score", DoubleType))
    val bs = batchSize
    val depth = math.max(1, prefetchDepth / math.max(1, batchSize))
    chunks.mapPartitions { rows =>
      new BatchPrefetcher(rows, bs, depth).flatMap { batch =>
        val scores = scoreBatch(batch.map(_.getString(idx)))
        require(scores.length == batch.length,
          s"scoreBatch returned ${scores.length} results for ${batch.length} inputs")
        batch.iterator.zip(scores.iterator).map { case (r, (label, s)) =>
          Row.fromSeq(r.toSeq :+ label :+ s)
        }
      }
    }(enc)
  }
}

/** Bounded producer/consumer over a partition iterator: a daemon thread
  * groups upstream rows into batches and `put`s them into a queue of at
  * most `depth` batches; the task thread consumes. Producer failures are
  * re-thrown on the consumer side so task retry semantics are preserved.
  */
private[text] final class BatchPrefetcher(
    rows: Iterator[Row], batchSize: Int, depth: Int)
    extends Iterator[Seq[Row]] {
  private val queue = new java.util.concurrent.ArrayBlockingQueue[AnyRef](depth)
  private val DONE = new Object
  @volatile private var failure: Throwable = null
  private val producer = new Thread(() => {
    try rows.grouped(batchSize).foreach(b => queue.put(b))
    catch { case t: Throwable => failure = t }
    finally queue.put(DONE)
  }, "graft-batch-prefetch")
  producer.setDaemon(true)
  producer.start()

  // if the task stops consuming mid-partition (limit, failure elsewhere),
  // the producer may be parked on a full queue holding upstream resources —
  // unblock it when the task completes
  Option(org.apache.spark.TaskContext.get()).foreach(
    _.addTaskCompletionListener[Unit] { _ => queue.clear(); producer.interrupt() })

  private var staged: AnyRef = null
  override def hasNext: Boolean = {
    if (staged == null) staged = queue.take()
    if (staged eq DONE) {
      queue.put(DONE) // keep subsequent hasNext calls terminal, not blocking
      if (failure != null) throw failure
      false
    } else true
  }
  override def next(): Seq[Row] = {
    if (!hasNext) throw new NoSuchElementException("empty prefetcher")
    val out = staged.asInstanceOf[Seq[Row]]
    staged = null
    out
  }
}

/** Deterministic stand-in batch model: lexicon semantics in plain Scala,
  * row-identical to [[LexiconSentimentModel]]'s Column program (asserted in
  * SentimentSpec) — so the partition-batched seam can sit under q34's
  * DuckDB oracle and a real scorer can be swapped in without touching the
  * pipeline.
  */
class BatchLexiconModel(
    positive: Seq[String] = WordLists.positive,
    negative: Seq[String] = WordLists.negative,
    batchSize: Int = 32, prefetchDepth: Int = 512)
    extends BatchSentimentModel(batchSize, prefetchDepth) {
  override val name = "lexicon-batch"
  override val version = "1.0"
  private val posSet = positive.toSet
  private val negSet = negative.toSet

  override def scoreBatch(texts: Seq[String]): Seq[(String, Double)] =
    texts.map { t =>
      // exactly TextFunctions.tokens: split(lower(trim(text)), "\s+")
      val toks = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      val pos = toks.count(posSet)
      val neg = toks.count(negSet)
      val label =
        if (pos > neg) "positive" else if (neg > pos) "negative" else "neutral"
      val score =
        if (pos + neg == 0) 0.5 else math.abs(pos - neg).toDouble / (pos + neg)
      (label, score)
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
