package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** χ² token–label association: hand-checked 2×2 tables, eligibility
  * filters, degenerate-denominator guard.
  */
class FeatureSelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, Seq[String], Boolean)], minDocs: Long = 1L) =
    FeatureSelection.chiSquareTokens(
      docs.toDF("doc_id", "toks", "lab"), "doc_id", "toks", "lab", minDocs)
      .select("token", "a", "b", "c", "d", "chi2_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("perfectly predictive token gets chi2 = N") {
    // "pos" appears in exactly the 2 labeled docs of 4
    val docs = Seq(
      (1L, Seq("pos", "x"), true), (2L, Seq("pos", "y"), true),
      (3L, Seq("neg", "x"), false), (4L, Seq("neg", "y"), false))
    val got = run(docs)
    assert(got("pos") === ((2L, 0L, 0L, 2L, 4000000L))) // chi2 = N = 4
    assert(got("neg") === ((0L, 2L, 2L, 0L, 4000000L)))
  }

  test("independent token scores zero") {
    val docs = Seq(
      (1L, Seq("t"), true), (2L, Seq("z"), true),
      (3L, Seq("t"), false), (4L, Seq("z"), false))
    val got = run(docs)
    assert(got("t") === ((1L, 1L, 1L, 1L, 0L)))
  }

  test("token in every doc and below-minDocs tokens are dropped") {
    val docs = Seq(
      (1L, Seq("all", "rare"), true), (2L, Seq("all"), true),
      (3L, Seq("all"), false), (4L, Seq("all"), false))
    val got = run(docs, minDocs = 2L)
    assert(!got.contains("all")) // present in all 4 → no information
    assert(!got.contains("rare")) // 1 < minDocs
  }

  test("presence semantics: repeated token in one doc counts once") {
    val docs = Seq(
      (1L, Seq("t", "t", "t"), true), (2L, Seq("z"), true),
      (3L, Seq("t"), false), (4L, Seq("z"), false))
    assert(run(docs)("t")._1 === 1L)
  }

  test("matches an independent JVM chi-square replay on skewed counts") {
    // token "s": a=3, b=1 of N=10, pos=5
    val docs =
      (1L to 3L).map(i => (i, Seq("s", "f"), true)) ++
        Seq((4L, Seq("f"), true), (5L, Seq("f"), true),
          (6L, Seq("s"), false)) ++
        (7L to 10L).map(i => (i, Seq("f"), false))
    val (a, b, c, d, n) = (3.0, 1.0, 2.0, 4.0, 10.0)
    val adbc = a * d - b * c
    val exp = math.round(
      n * adbc * adbc / ((a + b) * (c + d) * (a + c) * (b + d)) * 1e6)
    assert(run(docs)("s") === ((3L, 1L, 2L, 4L, exp)))
  }
}
