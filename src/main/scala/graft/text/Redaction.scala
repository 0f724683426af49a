package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus cleaning — the standard
  * scrub pass an LLM data pipeline runs before tokenization (emails, SSN-like
  * ids, IPv4 addresses). Patterns are deliberately RE2-compatible (no
  * backrefs, no lookaround) so the same regex runs identically under Spark's
  * Java regex and DuckDB's RE2 — which is what lets the whole pass sit under
  * the cross-engine oracle gate (q85).
  *
  * Scale: a pure narrow map over the text column — `regexp_count` /
  * `regexp_replace` are codegen'd Catalyst expressions, no UDF, no shuffle;
  * the pass pipelines with whatever scan feeds it and parallelizes with the
  * input partitioning.
  */
object Redaction {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val ipRe = "\\b([0-9]{1,3}\\.)([0-9]{1,3}\\.)([0-9]{1,3}\\.)[0-9]{1,3}\\b"

  /** Occurrence counts per category (computed on the raw text, before any
    * replacement shifts boundaries).
    */
  def countEmails(text: Column): Column = regexp_count(text, lit(emailRe))
  def countSsns(text: Column): Column = regexp_count(text, lit(ssnRe))
  def countIps(text: Column): Column = regexp_count(text, lit(ipRe))

  /** Redacted text: categories replaced by stable tokens, applied in a fixed
    * order (email → SSN → IP). The patterns are mutually exclusive on well-
    * formed text, but a fixed order keeps the result deterministic even on
    * adversarial inputs.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "[EMAIL]")
    val s = regexp_replace(e, ssnRe, "[SSN]")
    regexp_replace(s, ipRe, "[IP]")
  }

  /** Per-document PII report: category counts plus an md5 of the redacted
    * text (string-equality proof without materializing the full text
    * downstream).
    */
  def report(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      countEmails(t).as("n_emails"),
      countSsns(t).as("n_ssns"),
      countIps(t).as("n_ips"),
      md5(redact(t).cast("binary")).as("redacted_md5"))
  }
}
