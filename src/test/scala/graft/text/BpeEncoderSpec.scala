package graft.text

import graft.SparkTestBase

class BpeEncoderSpec extends SparkTestBase {
  import spark.implicits._

  test("encode: greedy-leftmost non-overlap within one rule") {
    // "a a a" merges positions 0-1 only (the survivor can't re-pair)
    assert(BpeEncoder.encode(Vector("a", "a", "a"), Vector(("a", "a")))
      === Vector("a a", "a"))
    // four in a row → two disjoint merges
    assert(BpeEncoder.encode(Vector("a", "a", "a", "a"), Vector(("a", "a")))
      === Vector("a a", "a a"))
  }

  test("encode: min-rank loop revisits earlier rules (≠ sequential passes)") {
    // rules: 0:(a, "b c") and 1:(b, c). On "a b c" the min-rank loop
    // applies rule 1 first (rule 0 not yet present), which CREATES rule
    // 0's operand; a sequential one-pass-per-rule encoder would stop at
    // "a | b c". This pins the true BPE semantics.
    val merges = Vector(("a", "b c"), ("b", "c"))
    assert(BpeEncoder.encode(Vector("a", "b", "c"), merges) === Vector("a b c"))
  }

  test("encode: rank priority wins over position") {
    // (b,c) outranks (a,b): "a b c" → "a | b c", not "a b | c"
    assert(BpeEncoder.encode(Vector("a", "b", "c"), Vector(("b", "c"), ("a", "b")))
      === Vector("a", "b c"))
  }

  test("encode: no applicable rule is the identity; short inputs survive") {
    assert(BpeEncoder.encode(Vector("x", "y"), Vector(("a", "b"))) === Vector("x", "y"))
    assert(BpeEncoder.encode(Vector("x"), Vector(("a", "b"))) === Vector("x"))
    assert(BpeEncoder.encode(Vector(), Vector(("a", "b"))) === Vector())
  }

  test("encodeStats: per-doc counts over a DataFrame") {
    val df = Seq((1L, "a b c d"), (2L, "a b a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = BpeEncoder.encodeStats(df, "text", "doc_id", Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      1L -> ((4L, 3L, 1L)),   // one merge
      2L -> ((4L, 2L, 2L)),   // two merges
      3L -> ((1L, 1L, 0L))))  // untouched
  }
}
