package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** MD&A section extraction from SEC filing text (T1/T2 — reference
  * collection/sentiment.py:62-79,99-237): entity decode → earliest start
  * pattern → EARLIEST end-pattern match wins → 100KB cap fallback → HTML
  * cleanup → ≥500-char validity guard.
  */
object Mda {

  private val startPatterns = Seq(
    "(?i)item\\s+7[\\.\\s:]*management['\\u2019]?s\\s+discussion\\s+and\\s+analysis",
    "(?i)item\\s+7[\\.\\s:]*md\\s*&\\s*a",
    "(?i)item\\s+7[\\.\\s:]*management['\\u2019]?s\\s+discussion",
    "(?i)item\\s+2[\\.\\s:]*management['\\u2019]?s\\s+discussion\\s+and\\s+analysis",
    "(?i)item\\s+2[\\.\\s:]*md\\s*&\\s*a").map(_.r)

  private val endPatterns = Seq(
    "(?i)item\\s+7a[\\.\\s:]*quantitative\\s+and\\s+qualitative",
    "(?i)item\\s+8[\\.\\s:]*financial\\s+statements",
    "(?i)item\\s+3[\\.\\s:]*quantitative\\s+and\\s+qualitative",
    "(?i)item\\s+4[\\.\\s:]*controls\\s+and\\s+procedures").map(_.r)

  private[text] def decodeHtmlEntities(text: String): String =
    text
      .replaceAll("&#8217;", "'").replaceAll("&#8216;", "'")
      .replaceAll("&#8220;", "\"").replaceAll("&#8221;", "\"")
      .replaceAll("&#160;", " ").replaceAll("&#38;", "&")
      .replaceAll("&#[0-9]+;", " ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&apos;", "'").replace("&rsquo;", "'").replace("&lsquo;", "'")
      .replace("&rdquo;", "\"").replace("&ldquo;", "\"")

  private[text] def cleanHtml(text: String): String =
    text
      .replaceAll("<[^>]+>", " ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replaceAll("\\s+", " ")
      .trim

  /** Extract the MD&A section, or None when not found / too short. */
  def extractMda(filingText: String, minLength: Int = 500,
      capBytes: Int = 100000): Option[String] = {
    if (filingText == null) return None
    val searchText = decodeHtmlEntities(filingText)

    val startMatch = startPatterns.iterator
      .map(_.findFirstMatchIn(searchText)).collectFirst { case Some(m) => m }
    startMatch.flatMap { sm =>
      val after = searchText.substring(sm.end)
      // earliest end-pattern match across ALL patterns wins
      val endIdx = endPatterns
        .flatMap(_.findFirstMatchIn(after)).map(_.start)
        .reduceOption(math.min)
      val body = endIdx match {
        case Some(i) => after.substring(0, i)
        case None => after.substring(0, math.min(after.length, capBytes))
      }
      val cleaned = cleanHtml(body)
      if (cleaned.length < minLength) None else Some(cleaned)
    }
  }

  /** Column form; null when extraction fails. */
  def extractMdaUdf(minLength: Int = 500): Column => Column = {
    val f = udf((t: String) => extractMda(t, minLength).orNull)
    c => f(c)
  }
}
