package graft.text

import org.scalatest.funsuite.AnyFunSuite

class ReadabilitySpec extends AnyFunSuite {

  test("sentence counting on simple punctuation") {
    assert(Readability.countSentences("One. Two! Three? Four.") === 4)
    assert(Readability.countSentences("No terminal punctuation") === 1)
  }

  test("syllable heuristic: vowel groups with silent-e and -ed/-es adjustments") {
    assert(Readability.countSyllables("cat") === 1)
    assert(Readability.countSyllables("beautiful") === 3) // eau-i-u
    assert(Readability.countSyllables("table") === 1)     // silent e
    assert(Readability.countSyllables("jumped") === 1)    // -ed adjusted
  }

  test("complex words are 3+ syllables") {
    assert(Readability.countComplexWords("the incredible organization") === 2)
    assert(Readability.countComplexWords("the cat sat") === 0)
  }

  test("fog index golden: 0.4 * (wps + pct_complex)") {
    // 10 words, 1 sentence, 0 complex -> 0.4 * (10 + 0) = 4.0
    val text = "the cat sat on the mat with a big dog."
    assert(Readability.fogIndex(text) === 4.0)
  }

  test("empty text yields zero fog and sentence length") {
    assert(Readability.fogIndex("") === 0.0)
    assert(Readability.avgSentenceLength("") === 0.0)
  }
}
