package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR weights/score/select behavior on a hand-built corpus. */
class ImportanceResamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def target = Seq((1L, "ticker earnings revenue guidance"),
    (2L, "earnings call revenue beat")).toDF("id", "text")
  private def raw = Seq(
    (10L, "earnings revenue guidance strong"),  // target-like
    (11L, "cat dog bird fish"),                 // off-domain
    (12L, "revenue earnings ticker call"),      // target-like
    (13L, "lorem ipsum dolor sit")).toDF("id", "text")

  test("target-domain documents outscore off-domain ones") {
    val w = ImportanceResampling.weights(target, raw, "text")
    val scores = ImportanceResampling.score(raw, "text", "id", w)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(10L) > scores(11L) && scores(12L) > scores(13L),
      s"target-like must outscore off-domain: $scores")
    assert(scores(11L) < 0 && scores(13L) < 0,
      s"off-domain tokens (raw-only) must score negative: $scores")
  }

  test("weights cover the union vocabulary; deltas are exact integers") {
    val w = ImportanceResampling.weights(target, raw, "text")
      .as[(String, Long)].collect().toMap
    val vocab = (target.unionByName(raw))
      .select(explode(graft.text.TextFunctions.tokens(col("text"))))
      .distinct().count()
    assert(w.size === vocab)
    // a token only in target has a strictly positive delta
    assert(w("beat") > 0 && w("cat") < 0)
  }

  test("select keeps ceil(fraction*N) rows, ties broken by id") {
    val w = ImportanceResampling.weights(target, raw, "text")
    val sel = ImportanceResampling.select(
      ImportanceResampling.score(raw, "text", "id", w), fraction = 0.5)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(sel === Set(10L, 12L), s"the two target-like docs win: $sel")
  }
}
