package graft.text

import org.scalatest.funsuite.AnyFunSuite

class MdaSpec extends AnyFunSuite {

  private val body = "Revenue grew due to strong demand. " * 20 // 700 chars

  test("extracts between Item 7 start and earliest end marker") {
    val filing = s"Item 7. Management's Discussion and Analysis $body" +
      s"Item 8. Financial Statements here Item 7A. Quantitative and Qualitative"
    val got = Mda.extractMda(filing).get
    assert(got.startsWith("Revenue grew"))
    assert(!got.contains("Financial Statements"))
  }

  test("earliest end-pattern match wins across patterns") {
    val filing = s"Item 7. Management's Discussion and Analysis $body" +
      s"Item 7A. Quantitative and Qualitative then Item 8. Financial Statements"
    val got = Mda.extractMda(filing).get
    assert(!got.contains("Quantitative"))
  }

  test("10-Q Item 2 start pattern also matches") {
    val filing = s"Item 2. Management's Discussion and Analysis $body" +
      "Item 3. Quantitative and Qualitative"
    assert(Mda.extractMda(filing).isDefined)
  }

  test("no end marker: capped fallback still extracts") {
    val filing = s"Item 7. Management's Discussion and Analysis $body"
    assert(Mda.extractMda(filing).isDefined)
  }

  test("too-short MD&A is rejected; missing start is rejected") {
    assert(Mda.extractMda("Item 7. Management's Discussion and Analysis tiny. Item 8. Financial Statements").isEmpty)
    assert(Mda.extractMda(s"Some preamble only. $body").isEmpty)
  }

  test("HTML entities decoded for matching, tags cleaned from output") {
    val filing = "Item 7. Management&#8217;s Discussion and Analysis " +
      s"<p>$body</p> Item 8. Financial Statements"
    val got = Mda.extractMda(filing).get
    assert(!got.contains("<p>"))
  }
}
