package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any k-token
  * shingle with a benchmark/eval set — the standard pre-training hygiene
  * pass (n-gram overlap decontamination, as popularized by the GPT-3 and
  * PaLM dataset reports).
  *
  * Scale design: the corpus side (100 TB) is exploded to hashed shingles
  * ONCE and streamed through an equi-join against the benchmark shingle
  * set. The benchmark is the small side (eval suites are MBs, not TBs) —
  * its distinct-shingle relation broadcasts, so the corpus never shuffles:
  * map-side semi-join + per-doc count aggregation reusing the
  * [[Dedup.hashedShinglePairs]] spread. Shingles compare as 64-bit hashes
  * (8-byte keys, [[graft.expressions.ShingleHashes]]) — a hash collision
  * can only inflate an overlap count by 1 at ~n²/2⁶⁵ odds.
  */
object Contamination {

  /** Per-corpus-document overlap report against `benchmark`:
    * (id, n_overlap = #distinct shared k-shingles, contaminated 0/1).
    * Corpus documents with no overlap are kept with n_overlap = 0.
    */
  def report(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame = {
    val corpusShingles = Dedup.hashedShinglePairs(corpus, textCol, idCol, k)
    val benchShingles = Dedup.hashedShinglePairs(benchmark, textCol, idCol, k)
      .select(col("sh")).distinct()
    val overlaps = corpusShingles
      .join(broadcast(benchShingles), Seq("sh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("id"))
      .join(overlaps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).cast("int").as("contaminated"))
  }
}
