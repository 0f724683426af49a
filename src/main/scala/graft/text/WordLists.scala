package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loughran-McDonald-style financial word categories (T5 — reference
  * derived/word_lists.py:14-341). Representative subsets of the public LM
  * dictionaries; ratio semantics mirror compute_word_ratios: category hits ÷
  * total alphabetic tokens, lowercase, punctuation stripped.
  */
object WordLists {

  val uncertainty: Seq[String] = Seq(
    "may", "could", "possibly", "uncertain", "uncertainty", "risk", "risks",
    "approximately", "depends", "fluctuate", "indefinite", "unpredictable",
    "variable", "pending", "probable", "unknown")

  val litigious: Seq[String] = Seq(
    "lawsuit", "litigation", "plaintiff", "defendant", "court", "claim",
    "claims", "alleged", "settlement", "damages", "attorney", "judicial",
    "legal", "proceeding")

  val constraining: Seq[String] = Seq(
    "required", "must", "obligated", "restrict", "restricted", "limit",
    "limited", "covenant", "comply", "mandatory", "prohibit", "constrain")

  val weakModal: Seq[String] = Seq(
    "may", "might", "could", "possibly", "perhaps", "sometimes", "almost")

  val strongModal: Seq[String] = Seq(
    "will", "must", "always", "never", "definitely", "strongly", "clearly")

  /** Generic sentiment lexicons for the default [[LexiconSentimentModel]]. */
  val positive: Seq[String] = Seq(
    "good", "great", "excellent", "strong", "growth", "improved", "gain",
    "profit", "success", "favorable", "positive", "fast", "efficient")

  val negative: Seq[String] = Seq(
    "bad", "poor", "weak", "decline", "loss", "losses", "impairment",
    "adverse", "negative", "failure", "slow", "risk", "error")

  /** Alphabetic-token extraction matching the reference's `\b[a-zA-Z]+\b`
    * over lowercased text (word_lists.py:283-341).
    */
  def alphaTokens(text: Column): Column =
    filter(split(lower(text), "[^a-zA-Z]+"), t => length(t) > 0)

  private def ratio(toks: Column, words: Seq[String]): Column =
    when(size(toks) > 0,
      size(filter(toks, t => t.isInCollection(words))).cast("double") / size(toks))
      .otherwise(0.0)

  /** All five LM ratios + word_count as one struct column (single
    * tokenization pass).
    */
  def ratios(text: Column): Column = {
    val toks = alphaTokens(text)
    struct(
      size(toks).cast("long").as("word_count"),
      ratio(toks, uncertainty).as("uncertainty_ratio"),
      ratio(toks, litigious).as("litigious_ratio"),
      ratio(toks, constraining).as("constraining_ratio"),
      ratio(toks, weakModal).as("weak_modal_ratio"),
      ratio(toks, strongModal).as("strong_modal_ratio"))
  }
}
