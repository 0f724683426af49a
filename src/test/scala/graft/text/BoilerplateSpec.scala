package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private val hdr = "one two three" // 3 tokens = exactly one segment at segWords=3

  test("segments chunks on the fixed token grid, last segment short") {
    val df = Seq(("a b c d e f g h", 1L)).toDF("text", "id")
    val out = df.select(Boilerplate.segments(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(out == Seq("a b c", "d e f", "g h"))
  }

  test("frequent segments found across documents, below-threshold kept") {
    val docs = Seq(
      (1L, s"$hdr alpha beta gamma"),
      (2L, s"$hdr delta eps zeta"),
      (3L, s"$hdr eta theta iota"),
      (4L, "kappa lambda mu nu xi omicron")).toDF("id", "text")
    val freq = Boilerplate.frequentSegments(docs, "text", "id", segWords = 3, minDocs = 3)
      .collect() // dimension-sized: the frequent-segment dictionary of a 4-doc corpus
    assert(freq.map(_.getString(0)).toSet == Set(hdr))
    assert(freq.head.getLong(1) == 3L)
  }

  test("removal strips only the shared segment and preserves order") {
    val docs = Seq(
      (1L, s"$hdr alpha beta gamma delta eps zeta"),
      (2L, s"$hdr eta theta iota"),
      (3L, s"$hdr kappa lambda mu"),
      (4L, "nu xi omicron pi rho sigma")).toDF("id", "text")
    val out = Boilerplate.removeFrequentSegments(docs, "text", "id",
        segWords = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "alpha beta gamma delta eps zeta")))
    assert(out(2L) == ((2L, 1L, "eta theta iota")))
    assert(out(4L) == ((2L, 0L, "nu xi omicron pi rho sigma")))
  }

  test("a document that is entirely boilerplate comes back empty") {
    val docs = Seq(
      (1L, hdr), (2L, hdr), (3L, hdr),
      (4L, s"$hdr tail words here")).toDF("id", "text")
    val out = Boilerplate.removeFrequentSegments(docs, "text", "id",
        segWords = 3, minDocs = 3)
      .filter(col("id") === 1L).head()
    assert(out.getLong(1) == 1L && out.getLong(2) == 1L && out.getString(3) == "")
  }

  test("mid-document occurrences only removed when grid-aligned") {
    // hdr appears mid-doc in doc 3 but OFF the 3-token grid — the aligned
    // corpus pass must not strip it (that is exact-substring q94's job)
    val docs = Seq(
      (1L, s"$hdr a b c"),
      (2L, s"$hdr d e f"),
      (3L, s"$hdr x $hdr y z"), // second occurrence starts at token 4 (unaligned)
      (4L, "p q r s t u")).toDF("id", "text")
    val out = Boilerplate.removeFrequentSegments(docs, "text", "id",
        segWords = 3, minDocs = 3)
      .filter(col("id") === 3L).head()
    assert(out.getString(3) == "x one two three y z")
  }
}
