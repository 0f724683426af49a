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

  test("select resolves boundary ties by id and never plans a global top-k heap") {
    // 100 rows, scores {0,100,200} — the k-th rank lands mid-tie, so the
    // boundary rule (ties → smallest id) does real work
    val scored = spark.range(0, 100).toDF("id")
      .select(col("id"), lit(5L).as("n_tokens"),
        (col("id") % 3 * 100).as("score_micro"))
    val sel = ImportanceResampling.select(scored, fraction = 0.4)
    // k = 40: all 33 rows at score 200, plus the 7 smallest ids at score 100
    val ids = sel.as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(ids.size === 40)
    val expectBoundary = (0L until 100L).filter(_ % 3 == 1).sorted.take(7).toSet
    assert(ids === (0L until 100L).filter(_ % 3 == 2).toSet ++ expectBoundary)
    // the scale contract: selection is histogram-threshold + filter — a
    // corpus-proportional k must NOT reach a single-task top-k merge
    val plan = sel.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"),
      s"select() must not plan a global top-k:\n$plan")
  }
}
