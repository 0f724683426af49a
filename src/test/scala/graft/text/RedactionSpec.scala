package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "reach me at jane.doe+x@corp.example.com or 10.0.42.7 today"),
    (2L, "ssn 123-45-6789 on file; backup 987-65-4321"),
    (3L, "no pii here, just 1234-5678 and v1.2.3 and a@b"),
    (4L, "")).toDF("doc_id", "text")

  test("counts each category; near-miss shapes don't match") {
    val r = Redaction.report(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select("n_emails", "n_ssns", "n_ips")
      .as[(Int, Int, Int)].collect().toSeq
    assert(r === Seq((1, 0, 1), (0, 2, 0), (0, 0, 0), (0, 0, 0)))
  }

  test("redact replaces with stable tokens and leaves clean text unchanged") {
    val out = docs.select($"doc_id", Redaction.redact($"text").as("t"))
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(out(1L) === "reach me at [EMAIL] or [IP] today")
    assert(out(2L) === "ssn [SSN] on file; backup [SSN]")
    assert(out(3L) === "no pii here, just 1234-5678 and v1.2.3 and a@b")
    assert(out(4L) === "")
  }
}
