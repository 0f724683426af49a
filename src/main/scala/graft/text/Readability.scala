package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Readability metrics (T6 — reference derived/sentiment.py:120-172):
  * sentence counting, 3+-syllable complex-word counting via vowel-group
  * heuristic (silent-e and -ed/-es adjustments), Gunning Fog index
  * `0.4 * (words_per_sentence + pct_complex)`, average sentence length.
  * Pure functions (property-testable) exposed as UDFs.
  */
object Readability {

  private val sentenceSplit = "[.!?]+(?:\\s|$)".r
  private val wordPattern = "\\b[a-zA-Z]+\\b".r
  private val vowelGroups = "[aeiouy]+".r

  def countSentences(text: String): Int =
    sentenceSplit.split(text).count(_.trim.nonEmpty)

  def countSyllables(word: String): Int = {
    var syllables = vowelGroups.findAllIn(word).length
    if (word.endsWith("e") && syllables > 1) syllables -= 1
    if ((word.endsWith("ed") || word.endsWith("es")) && syllables > 1) syllables -= 1
    syllables
  }

  def countComplexWords(text: String): Int =
    wordPattern.findAllIn(text.toLowerCase).count(countSyllables(_) >= 3)

  def wordCount(text: String): Int = wordPattern.findAllIn(text).length

  /** Gunning Fog = 0.4 * (avg words/sentence + % complex words), 2dp. */
  def fogIndex(text: String): Double = {
    val words = wordCount(text)
    val sentences = countSentences(text)
    if (words == 0 || sentences == 0) return 0.0
    val avgWps = words.toDouble / sentences
    val pctComplex = countComplexWords(text).toDouble / words * 100
    math.round(0.4 * (avgWps + pctComplex) * 100) / 100.0
  }

  def avgSentenceLength(text: String): Double = {
    val sentences = countSentences(text)
    if (sentences == 0) 0.0
    else math.round(wordCount(text).toDouble / sentences * 100) / 100.0
  }

  val fogIndexUdf: Column => Column = { val f = udf(fogIndex _); c => f(c) }
  val sentenceCountUdf: Column => Column = { val f = udf(countSentences _); c => f(c) }
  val complexWordsUdf: Column => Column = { val f = udf(countComplexWords _); c => f(c) }
  val avgSentenceLengthUdf: Column => Column = { val f = udf(avgSentenceLength _); c => f(c) }
}
