package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.UnicodeNormalize

/** Unicode canonicalization for text pipelines — the step that runs BEFORE
  * exact-dup hashing, shingling, or tokenization so that visually-identical
  * strings hash identically: precomposed vs decomposed forms ("é" U+00E9 vs
  * "e"+U+0301) are distinct byte sequences and would otherwise defeat every
  * content-hash dedup key.
  *
  * Built on the codegen'd [[graft.expressions.UnicodeNormalize]] kernel
  * (JDK UAX #15, `isNormalized` fast path — one scan, no allocation on the
  * already-normal common case) composed with codegen'd built-ins; no UDFs.
  */
object Normalization {

  /** Canonical composition (NFC) — the interchange-form default. */
  def nfc(s: Column): Column = UnicodeNormalize(s, "NFC")

  /** Canonical decomposition (NFD). */
  def nfd(s: Column): Column = UnicodeNormalize(s, "NFD")

  /** Compatibility composition (NFKC) — folds ligatures/width variants;
    * the aggressive form LLM-corpus dedup typically keys on.
    */
  def nfkc(s: Column): Column = UnicodeNormalize(s, "NFKC")

  /** Accent folding: decompose, strip nonspacing marks (\\p{Mn}), recompose.
    * "naïve résumé" → "naive resume"; keeps non-accent letters (ß, ligatures)
    * untouched — the same contract as DuckDB/ICU `strip_accents`.
    */
  def foldAccents(s: Column): Column =
    UnicodeNormalize(regexp_replace(nfd(s), "\\p{Mn}", ""), "NFC")

  /** The dedup-key form: NFC → accent-fold → lowercase. */
  def canonical(s: Column): Column = lower(foldAccents(s))
}
