package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkTestBase {
  import spark.implicits._

  /** The builtin composition the native expression must match bit-for-bit. */
  private def builtinForm(toks: org.apache.spark.sql.Column, k: Int) =
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => xxhash64(slice(toks, i + 1, lit(k)))))
        .otherwise(array(xxhash64(toks))))

  test("bit-identical to the xxhash64(slice) composition on fixture documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = graft.text.TextFunctions.tokens($"text")
    val both = docs.select(
      ShingleHashes(toks, 3).as("native"),
      builtinForm(toks, 3).as("builtin"))
    val diff = both.filter($"native" =!= $"builtin").count()
    assert(diff === 0)
    // sets must be non-trivial for the test to mean anything
    assert(both.select(explode($"native")).distinct().count() > 1000)
  }

  test("short-document fallback hashes the whole token array") {
    val df = Seq("a b", "a", "").toDF("t")
    val toks = graft.text.TextFunctions.tokens($"t")
    val got = df.select(ShingleHashes(toks, 3).as("n"), builtinForm(toks, 3).as("b"))
    assert(got.filter($"n" =!= $"b").count() === 0)
    assert(got.select(size($"n")).as[Int].collect().forall(_ === 1))
  }

  test("duplicate shingles collapse in first-occurrence order") {
    val df = Seq("x y x y x y x y").toDF("t") // shingles repeat after 2 positions
    val toks = graft.text.TextFunctions.tokens($"t")
    val native = df.select(ShingleHashes(toks, 3).as("n")).select($"n")
      .as[Seq[Long]].head()
    val builtin = df.select(builtinForm(toks, 3).as("b")).select($"b")
      .as[Seq[Long]].head()
    assert(native === builtin)
    assert(native.length === 2) // "x y x" and "y x y"
  }

  test("type errors surface at analysis time") {
    val df = Seq(Array(1, 2, 3)).toDF("a")
    val ex = intercept[Exception] {
      df.select(ShingleHashes($"a", 3)).collect()
    }
    assert(ex.getMessage.contains("array<string>"))
  }
}
