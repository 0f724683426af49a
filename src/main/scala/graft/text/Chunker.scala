package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Overlapping text chunking with sentence-boundary snapping (T3 — reference
  * derived/sentiment.py:70-117): ~chunkSize chars per chunk, searching the
  * last 20% of each chunk for the latest sentence separator, `overlap` chars
  * of continuity between chunks.
  *
  * The one generator in the pipeline: 1 document → N chunks, surfaced as an
  * array-returning UDF + `explode` (not a custom Generator — SURVEY §2.11).
  */
object Chunker {

  private val separators = Seq(". ", ".\n", "! ", "? ")

  def chunkText(text: String, chunkSize: Int = 1500, overlap: Int = 200): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    if (text.length <= chunkSize) return Seq(text)

    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var continue = true
    while (continue && start < text.length) {
      // `end` may exceed text.length — that overshoot is what advances
      // `start` past the end on the final chunk and terminates the loop
      // (clamping it would pin start at len - overlap forever).
      var end = start + chunkSize
      if (end < text.length) {
        // snap to the last sentence boundary in the final 20% of the chunk
        val searchStart = (end - chunkSize * 0.2).toInt
        val searchText = text.substring(searchStart, end)
        separators.iterator
          .map(sep => (sep, searchText.lastIndexOf(sep)))
          .find(_._2 != -1)
          .foreach { case (sep, idx) => end = searchStart + idx + sep.length }
      }
      val chunk = text.substring(start, math.min(end, text.length)).trim
      if (chunk.nonEmpty) chunks += chunk
      // forward-progress guard: with overlap close to chunkSize, sentence
      // snapping can pull `end - overlap` at or behind `start` — never move
      // backwards (unbounded loop + OOM otherwise)
      start = math.max(end - overlap, start + 1)
      if (start >= text.length) continue = false
    }
    chunks.toSeq
  }

  /** Column form: array<string> of chunks. */
  def chunksUdf(chunkSize: Int = 1500, overlap: Int = 200): Column => Column = {
    val f = udf((t: String) => chunkText(t, chunkSize, overlap))
    c => f(c)
  }
}
