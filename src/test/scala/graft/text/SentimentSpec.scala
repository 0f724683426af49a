package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SentimentSpec extends SparkTestBase {
  import spark.implicits._

  test("lexicon model labels by positive-vs-negative hit margin") {
    val chunks = Seq(
      (1L, "strong growth and excellent profit"),      // positive
      (2L, "decline and loss with adverse risk"),      // negative
      (3L, "the quarterly report was filed on time"))  // neutral (no hits)
      .toDF("doc_id", "chunk")
    val out = new LexiconSentimentModel().score(chunks, "chunk")
      .select("doc_id", "label", "score")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === "positive" && out(1L)._2 === 1.0)
    assert(out(2L)._1 === "negative" && out(2L)._2 === 1.0)
    assert(out(3L) === ("neutral", 0.5))
  }

  test("batch seam is row-identical to the Column-program lexicon model") {
    val chunks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text".as("chunk"))
      .repartition(7) // odd partitioning: batch boundaries must not matter
    def collect(m: SentimentModel) =
      m.score(chunks, "chunk").select("doc_id", "label", "score")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    // tiny batch + shallow prefetch exercises many queue cycles
    assert(collect(new BatchLexiconModel(batchSize = 3, prefetchDepth = 7)) ===
      collect(new LexiconSentimentModel()))
  }

  test("batch seam preserves non-text columns and propagates model failures") {
    val chunks = Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "extra", "chunk")
    val out = new BatchLexiconModel().score(chunks, "chunk")
    assert(out.columns.toSeq === Seq("id", "extra", "chunk", "label", "score"))
    assert(out.select("extra").as[String].collect().sorted.toSeq === Seq("x", "y"))
    val boom = new BatchSentimentModel(batchSize = 1) {
      val name = "boom"; val version = "0"
      def scoreBatch(texts: Seq[String]): Seq[(String, Double)] =
        throw new IllegalStateException("model down")
    }
    val e = intercept[Exception] { boom.score(chunks, "chunk").collect() }
    assert(e.getMessage != null)
  }

  test("aggregate matches reference semantics on a hand-computed filing") {
    // chunk sentiments: +1.0, -1.0, 0.0 → mean 0, sample std 1, range 2,
    // median 0, skew 0, extreme_neg (< -0.5) ratio 1/3
    val scored = Seq(
      (1L, "positive", 1.0), (1L, "negative", 1.0), (1L, "neutral", 0.5))
      .toDF("doc_id", "label", "score")
    val r = Sentiment.aggregate(scored, Seq("doc_id")).collect().head
    assert(r.getAs[Long]("chunk_count") === 3)
    assert(r.getAs[Double]("sentiment_score") === 0.0)
    assert(r.getAs[Double]("sentiment_std") === 1.0)
    assert(r.getAs[Double]("sentiment_range") === 2.0)
    assert(r.getAs[Double]("sentiment_skew") === 0.0)
    assert(r.getAs[Double]("extreme_negative_ratio") === 0.3333)
    assert(r.getAs[Double]("positive_ratio") === 0.3333)
    assert(r.getAs[Double]("avg_positive_confidence") === 1.0)
  }

  test("single-chunk filing: std/range/skew are zero (reference edge case)") {
    val scored = Seq((1L, "positive", 0.9)).toDF("doc_id", "label", "score")
    val r = Sentiment.aggregate(scored, Seq("doc_id")).collect().head
    assert(r.getAs[Double]("sentiment_std") === 0.0)
    assert(r.getAs[Double]("sentiment_range") === 0.0)
    assert(r.getAs[Double]("sentiment_skew") === 0.0)
  }

  test("pipeline end-to-end emits all metric columns with model info") {
    val filings = Seq((1L, ("Strong growth in revenue. " * 30) + "Some risk and decline. "))
      .toDF("doc_id", "body")
    val out = Sentiment.pipeline(filings, "body", Seq("doc_id"),
      chunkSize = 120, overlap = 20)
    val r = out.collect().head
    assert(r.getAs[Long]("chunk_count") > 1)
    assert(r.getAs[String]("model_name") === "lexicon")
    assert(r.getAs[Double]("fog_index") > 0)
    assert(r.getAs[Long]("word_count") > 0)
    Seq("sentiment_score", "uncertainty_ratio", "avg_sentence_length")
      .foreach(c => assert(out.columns.contains(c)))
  }
}
