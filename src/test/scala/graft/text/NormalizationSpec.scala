package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** UnicodeNormalize kernel + Normalization pipeline: precomposed and
  * decomposed spellings must land on identical bytes, accent folding must
  * strip marks and nothing else, and the codegen'd path must agree with
  * the interpreted fallback.
  */
class NormalizationSpec extends SparkTestBase {

  private val pre = "café naïve Straße Hölle"
  // dec spells the SAME visible text with combining marks, written as
  // explicit \u escapes so a normalizing formatter cannot collapse it
  private val dec = "cafe\u0301 nai\u0308ve Stra\u00dfe Ho\u0308lle"

  private def one(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.as("v")).head().getString(0)

  test("NFC collapses decomposed to precomposed; byte-identical forms") {
    val s = spark; import s.implicits._
    assert(pre != dec) // distinct inputs...
    val out = Seq(pre, dec).toDF("t")
      .select(Normalization.nfc(col("t")).as("n")).as[String].collect()
    assert(out(0) === out(1)) // ...identical after NFC
    assert(out(0) === pre)    // and equal to the precomposed spelling
  }

  test("canonical dedup key: accent-folded + lowered, sharp-s preserved") {
    assert(one(Normalization.canonical(lit(pre))) === "cafe naive straße holle")
    assert(one(Normalization.foldAccents(lit("résumé"))) === "resume")
    // non-accented text passes through untouched
    assert(one(Normalization.canonical(lit("Plain ASCII 123"))) === "plain ascii 123")
  }

  test("NFKC folds compatibility forms (ligature, fullwidth)") {
    assert(one(Normalization.nfkc(lit("ﬁle ＡＢ"))) === "file AB")
    // NFC leaves them alone
    assert(one(Normalization.nfc(lit("ﬁle"))) === "ﬁle")
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val s = spark; import s.implicits._
    val df = Seq(Some(dec), None, Some("ascii")).toDF("t")
    val viaExpr = df.select(Normalization.nfc(col("t"))).collect().map(_.get(0))
    // interpreted reference: eval the same expression off the codegen path
    val ref = Seq(java.text.Normalizer.normalize(dec, java.text.Normalizer.Form.NFC),
      null, "ascii")
    assert(viaExpr.toSeq === ref)
  }

  test("SQL registration: unicode_norm works in spark.sql") {
    graft.expressions.GraftFunctions.registerAll(spark)
    val r = spark.sql(s"SELECT unicode_norm('café', 'NFC') AS n")
      .head().getString(0)
    assert(r === "café")
  }

  test("properties on random strings: idempotence, canonical stability, null safety") {
    val s = spark; import s.implicits._
    // deterministic pseudo-random strings mixing ASCII, precomposed,
    // combining marks, ligatures, and astral-plane codepoints
    val alphabet: Array[String] = Array(
      "a", "Z", "9", " ", "é", "é", "ï", "ï", "ß", "ﬁ",
      "Ａ", "中", "🎉", "é́" /* e-acute + extra acute */)
    val rnd = new scala.util.Random(42)
    val strs = (1 to 200).map(_ =>
      (1 to rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = strs.toDF("t")
    val checked = df.select(
      (Normalization.nfc(Normalization.nfc(col("t"))) ===
        Normalization.nfc(col("t"))).as("nfc_idem"),
      (Normalization.canonical(col("t")) ===
        Normalization.canonical(Normalization.nfd(col("t")))).as("canon_stable"),
      (Normalization.nfkc(Normalization.nfkc(col("t"))) ===
        Normalization.nfkc(col("t"))).as("nfkc_idem"))
    val bad = checked.filter(!col("nfc_idem") || !col("canon_stable") || !col("nfkc_idem"))
    assert(bad.count() === 0)
    // null in, null out, no crash
    assert(Seq(Option.empty[String]).toDF("t")
      .select(Normalization.canonical(col("t"))).head().isNullAt(0))
  }

  test("exact-dup hashing sees through spelling variants once canonicalized") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, pre), (2L, dec)).toDF("doc_id", "text")
      .withColumn("text", Normalization.canonical(col("text")))
    val annotated = graft.operators.Dedup.exact(docs, "text", "doc_id")
    // the two spellings share one content hash; only doc 1 is kept
    assert(annotated.filter(col("keep")).count() === 1)
    assert(annotated.select(countDistinct(col("content_hash"))).head().getLong(0) === 1)
  }
}
