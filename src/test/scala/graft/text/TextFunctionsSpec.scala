package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("tokenCount and avgTokenLength") {
    val r = one("The quick  brown fox")
      .select(TextFunctions.tokenCount($"t").as("n"),
        TextFunctions.avgTokenLength($"t").as("avg"))
      .first()
    assert(r.getInt(0) === 4)
    assert(math.abs(r.getDouble(1) - 16.0 / 4) < 1e-12)
  }

  test("wordRatio counts dictionary hits case-insensitively") {
    val r = one("The cat AND the dog")
      .select(TextFunctions.wordRatio($"t", Seq("the", "and")).as("r")).first()
    assert(r.getDouble(0) === 3.0 / 5)
  }

  test("langId picks the best-scoring language deterministically") {
    val dicts = Map(
      "en" -> Seq("the", "and", "is"),
      "de" -> Seq("der", "und", "ist"))
    val out = Seq("the cat is here and happy", "der hund ist gut und treu")
      .toDF("t").select(TextFunctions.langId($"t", dicts).as("lang"))
      .as[String].collect()
    assert(out.toSeq === Seq("en", "de"))
  }

  test("fingerprints: content vs bag-of-words vs rolling") {
    val df = Seq(
      ("a b c", "a b c"), ("c b a", "a stirred order"))
      .toDF("x", "y")
    val r1 = one("a b c").select(
      TextFunctions.contentFingerprint($"t"),
      TextFunctions.bagOfWordsFingerprint($"t"),
      TextFunctions.rollingFingerprint($"t")).first()
    val r2 = one("c b a").select(
      TextFunctions.contentFingerprint($"t"),
      TextFunctions.bagOfWordsFingerprint($"t"),
      TextFunctions.rollingFingerprint($"t")).first()
    assert(r1.getString(0) !== r2.getString(0)) // content differs
    assert(r1.getString(1) === r2.getString(1)) // same bag of words
    assert(r1.getLong(2) !== r2.getLong(2))     // order-sensitive
  }

  test("portableTokenHash matches little-endian first-4-bytes of md5") {
    // md5("hello") = 5d41402a... → LE of 5d 41 40 2a = 0x2a40415d
    val got = one("hello").select(TextFunctions.portableTokenHash($"t")).first().getLong(0)
    assert(got === 0x2a40415dL)
  }

  test("qualityScore is in [0,1] and increases with stopword presence") {
    val hi = one("the cat and the dog is here " * 20)
    val lo = one("zzz qqq xxx")
    val s = Seq("the", "and", "is")
    val h = hi.select(TextFunctions.qualityScore($"t", s)).first().getDouble(0)
    val l = lo.select(TextFunctions.qualityScore($"t", s)).first().getDouble(0)
    assert(h > l && h <= 1.0 && l >= 0.0)
  }
}
