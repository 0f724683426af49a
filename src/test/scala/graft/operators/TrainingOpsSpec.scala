package graft.operators

import graft.SparkTestBase
import graft.text.{Collocations, QualityFilters}
import org.apache.spark.sql.functions._

class TrainingOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("contamination flags docs sharing a k-shingle with the benchmark, and only those") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no overlap at all here now")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "we observed the quick brown fox jumps over the lazy dog in the wild"))
      .toDF("doc_id", "text")
    val r = Contamination.report(corpus, bench, "text", "doc_id", k = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).sortBy(_._1)
    // doc 1 shares "the quick brown fox jumps over the lazy (dog)" 8-grams
    assert(r(0)._1 === 1L && r(0)._2 > 0 && r(0)._3 === 1)
    assert(r(1) === ((2L, 0L, 0)))
  }

  test("gopher stats: degenerate repetition fails the gate, normal prose passes") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "markets closed broadly higher after the quarterly earnings reports surprised analysts"))
      .toDF("doc_id", "text")
    val r = QualityFilters.gopherStats(docs, "text", "doc_id")
      .orderBy("id").collect()
    val bad = r(0); val good = r(1)
    assert(bad.getAs[Double]("top_word_frac") === 1.0)
    assert(bad.getAs[Double]("dup_bigram_frac") === 1.0)
    assert(bad.getAs[Int]("pass") === 0)
    assert(good.getAs[Double]("top_word_frac") < 0.3)
    assert(good.getAs[Int]("pass") === 1)
  }

  test("compression ratio: repetitive text compresses far better than varied text") {
    val varied = (1 to 80).map(i => s"tok${i * 7919 % 1000}x$i").mkString(" ")
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam " * 20),
      (2L, varied),
      (3L, ""))
      .toDF("doc_id", "text")
    val r = QualityFilters.compressionRatio(docs, "text", "doc_id")
      .orderBy("id").collect()
    val (rep, var_, empty) = (r(0), r(1), r(2))
    assert(rep.getAs[Double]("compression_ratio") <
      var_.getAs[Double]("compression_ratio") / 3)
    assert(var_.getAs[Double]("compression_ratio") > 0.2)
    assert(empty.getAs[Double]("compression_ratio") === 1.0)
    assert(rep.getAs[Int]("n_bytes") > rep.getAs[Int]("compressed_bytes"))
    // deterministic across invocations and partitionings
    val again = QualityFilters.compressionRatio(docs.repartition(3), "text", "doc_id")
      .orderBy("id").collect()
    assert(r.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("embedding centroids: exact component means, invariant to partitioning") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 6.0f)),
      (2, Seq(-1.5f, 0.5f))).toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      EmbeddingStats.centroids(d, "embedding", "label")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val r = run(df)
    assert(r === Seq((1, 0L, 2.0, 2L), (1, 1L, 4.0, 2L), (2, 0L, -1.5, 1L), (2, 1L, 0.5, 1L)))
    assert(run(df.repartition(5)) === r)
  }

  test("pmi: a bigram occurring more than independence predicts scores positive and first") {
    // "new york" always adjacent; "the" is frequent and dispersed.
    val docs = (1L to 6L).map(i =>
      (i, "new york traders saw the index rise while the volume fell"))
      .toDF("doc_id", "text")
    val r = Collocations.pmi(docs, "text", "doc_id", minCount = 5L, topK = 5)
      .collect()
    assert(r.nonEmpty)
    val best = r.head
    // top collocation is a deterministic max-PMI bigram with positive score
    assert(best.getAs[Double]("pmi") > 0)
    // every returned bigram meets the count floor
    assert(r.forall(_.getAs[Long]("c_ab") >= 5L))
    // ordering is (pmi desc, w1, w2)
    val scores = r.map(_.getAs[Double]("pmi")).toSeq
    assert(scores === scores.sorted.reverse)
  }
}
