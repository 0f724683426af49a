package graft.text

import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {

  test("short text returns a single chunk; empty returns none") {
    assert(Chunker.chunkText("hello world", 1500, 200) === Seq("hello world"))
    assert(Chunker.chunkText("", 1500, 200) === Seq.empty)
    assert(Chunker.chunkText(null, 1500, 200) === Seq.empty)
  }

  test("long text chunks with overlap continuity") {
    val text = ("word " * 400).trim // 1999 chars
    val chunks = Chunker.chunkText(text, 500, 100)
    assert(chunks.length > 1)
    // consecutive chunks share overlapping content
    val tail = chunks(0).takeRight(50)
    assert(chunks(1).contains(tail.takeRight(20)))
    // full coverage: every chunk within size bound (+ small snap slack)
    assert(chunks.forall(_.length <= 500))
  }

  test("snaps to sentence boundary in the last 20% of a chunk") {
    val sentence = "This is a sentence that fills space nicely. "
    val text = sentence * 30 // ~1350 chars
    val chunks = Chunker.chunkText(text, 600, 100)
    // every non-final chunk ends at a sentence boundary (snapped)
    chunks.dropRight(1).foreach(c => assert(c.endsWith(".")))
  }

  test("no infinite loop when overlap approaches chunk size") {
    val text = "x" * 3000 // no sentence separators at all
    val chunks = Chunker.chunkText(text, 500, 100)
    assert(chunks.nonEmpty && chunks.length < 20)
  }

  test("terminates even when snapping pulls end behind start + overlap") {
    // overlap = 90% of chunkSize with a separator near every 80% boundary:
    // end - overlap would move backwards without the forward-progress guard
    val text = ("abcdefghij. " * 300)
    val chunks = Chunker.chunkText(text, 100, 90)
    assert(chunks.nonEmpty && chunks.length <= text.length)
  }
}
