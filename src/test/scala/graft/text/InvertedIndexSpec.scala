package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Positional index: exact-phrase semantics, AND search, trigram mining. */
class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the cat mat"),
    (2L, "the cat"),
    (3L, "cat the cat the cat"),
    (4L, "dog")
  ).toDF("doc_id", "text")

  private def idx = InvertedIndex.build(docs, "text", "doc_id")

  test("index carries exact positions") {
    val rows = idx.filter(col("id") === 2L).orderBy("pos")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows === Seq(("the", 2L, 0L), ("cat", 2L, 1L)))
  }

  test("phrase search counts all occurrences, including overlapping runs") {
    val m = InvertedIndex.phraseSearch(idx, Seq("the", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    // 3-token phrase
    val m3 = InvertedIndex.phraseSearch(idx, Seq("cat", "the", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(m3 === Map(3L -> 2L)) // overlapping at pos 0 and 2
  }

  test("phrase does not match across token gaps or reversed order") {
    val m = InvertedIndex.phraseSearch(idx, Seq("cat", "mat"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L)) // only the adjacent pair in doc 1
    assert(InvertedIndex.phraseSearch(idx, Seq("mat", "cat")).count() === 0)
  }

  test("allTerms is conjunctive and duplicate-tolerant") {
    val ids = InvertedIndex.allTerms(idx, Seq("cat", "mat"))
      .as[Long].collect().toSet
    assert(ids === Set(1L))
    assert(InvertedIndex.allTerms(idx, Seq("cat", "cat", "the"))
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(InvertedIndex.allTerms(idx, Seq("unicorn")).count() === 0)
  }

  test("trigram relation matches a hand count") {
    val t = InvertedIndex.trigrams(idx)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c"))
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(t(("the", "cat", "sat")) === 1L)
    assert(t(("cat", "the", "cat")) === 2L)
    assert(!t.contains(("cat", "mat", "the"))) // no cross-doc trigrams
  }
}
