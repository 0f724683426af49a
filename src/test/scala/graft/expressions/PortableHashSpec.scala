package graft.expressions

import graft.SparkTestBase
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class PortableHashSpec extends SparkTestBase {
  import spark.implicits._

  test("portable token hash: bit-identical to the md5/conv composition on fixture tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(TextFunctions.tokens($"text")).as("tok"))
    val both = toks.select(
      PortableTokenHash($"tok").as("native"),
      TextFunctions.portableTokenHashBuiltin($"tok").as("builtin"))
    assert(both.filter($"native" =!= $"builtin").count() === 0)
    // the domain must exercise more than a handful of hash values
    assert(both.select($"native").distinct().count() > 20)
  }

  test("portable token hash: unicode, empty string, null") {
    val df = Seq(Some("héllo"), Some("日本語"), Some(""), Some("a"), None)
      .toDF("t")
    val both = df.select($"t",
      PortableTokenHash($"t").as("native"),
      TextFunctions.portableTokenHashBuiltin($"t").as("builtin"))
    val rows = both.collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(r.getLong(1) === r.getLong(2), s"mismatch on '${r.getString(0)}'")
    }
    // values are unsigned 32-bit
    assert(rows.filter(!_.isNullAt(1)).forall { r =>
      r.getLong(1) >= 0L && r.getLong(1) <= 0xffffffffL })
  }

  test("rolling fingerprint: bit-identical to the HOF aggregate fold on fixture documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      TextFunctions.rollingFingerprint($"text").as("native"),
      TextFunctions.rollingFingerprintBuiltin($"text").as("builtin"))
    assert(both.filter($"native" =!= $"builtin").count() === 0)
    assert(both.select($"native").distinct().count() > 100)
  }

  test("rolling fingerprint: degenerate inputs match the builtin fold") {
    val df = Seq(Some(""), Some("one two three"), None).toDF("text")
    val got = df.select(
      TextFunctions.rollingFingerprint($"text").as("n"),
      TextFunctions.rollingFingerprintBuiltin($"text").as("b")).collect()
    got.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getLong(0) === r.getLong(1))
    }
  }
}
