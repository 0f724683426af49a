package graft.text

import graft.SparkTestBase

/** Graph construction + rank behavior of the TextRank composition. */
class TextRankSpec extends SparkTestBase {
  import spark.implicits._

  test("hub token outranks leaves; topK order is deterministic") {
    // 'core' co-occurs with everything; leaves only with 'core'
    val docs = Seq(
      (1L, "core alpha core beta core gamma"),
      (2L, "delta core epsilon core zeta"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    val got = TextRank.keywords(docs, "text", "doc_id",
        window = 2, iters = 3, topK = 10)
      .as[(String, Long)].collect()
    assert(got.head._1 === "core", s"hub must rank first: ${got.toSeq}")
    assert(got.map(_._2).sameElements(got.map(_._2).sorted.reverse))
    // all seven distinct tokens participate in edges
    assert(got.map(_._1).toSet ===
      Set("core", "alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
  }

  test("window=1 uses only adjacent pairs; isolated tokens drop") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextRank.keywords(docs, "text", "doc_id",
        window = 1, iters = 2, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got.keySet === Set("a", "b"), "token 'c' has no edges")
    assert(got("a") === got("b"), "symmetric pair, symmetric rank")
  }

  test("vocabulary ids come from the distributed dense rank: no " +
      "single-row array agg, no unpartitioned window in the plan") {
    val docs = Seq((1L, "p q r p"), (2L, "q r s t")).toDF("doc_id", "text")
    val df = TextRank.keywords(docs, "text", "doc_id", topK = 5)
    val plan = df.queryExecution.analyzed.toString
    assert(!plan.contains("collect_list"),
      "vocab assignment must not funnel the token universe into one array row")
    val optimized = df.queryExecution.optimizedPlan
    val badWindows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(badWindows.isEmpty, s"unpartitioned window(s): $badWindows")
    // parity with the sorted-distinct assignment the rank replaced
    val got = df.as[(String, Long)].collect().map(_._1).toSet
    assert(got === Set("p", "q", "r", "s", "t"))
  }

  test("determinism: two runs produce identical rows") {
    val docs = Seq((1L, "x y z x y"), (2L, "z z y x w v")).toDF("doc_id", "text")
    val a = TextRank.keywords(docs, "text", "doc_id").as[(String, Long)].collect().toSeq
    val b = TextRank.keywords(docs, "text", "doc_id").as[(String, Long)].collect().toSeq
    assert(a === b)
  }
}
