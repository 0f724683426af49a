package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Exact-substring duplication analysis (the ExactSubstr side of
  * "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): find every k-token span that occurs in more than one
  * document and measure, per document, how much of its token stream sits
  * under such spans. Unlike the set-based near-dup family
  * ([[Dedup.shingles]] is an `array_distinct` set), positions are
  * preserved, so repeated spans inside one document count every occurrence
  * and coverage is the exact union of overlapping span intervals.
  *
  * Scale design:
  *  - the positional-gram relation is the only corpus-sized intermediate;
  *    it feeds (a) one hash-groupBy on the gram key (map-side combined
  *    `countDistinct` via partial aggregation) and (b) one equi-join back
  *    on the same key — no all-pairs comparison anywhere;
  *  - coverage is computed WITHOUT a second explode: duplicated span
  *    starts are collected per document (bounded by the document's own
  *    token count) and the interval union is folded with a HOF
  *    `aggregate` over the sorted starts, so the per-document state is
  *    one (covered, nextFree) struct;
  *  - `gramKey` defaults to xxhash64 (8-byte join/group key — the same
  *    shuffle-width argument as [[Dedup.hashedShinglePairs]]); pass
  *    identity for an engine-portable exact run (the q94 oracle gate).
  */
object ExactSubstring {

  /** One row per (id, pos, gram, n_toks): every k-token window with its
    * 0-based start position. Documents shorter than k tokens contribute a
    * single whole-text gram at pos 0 (mirrors [[Dedup.shingles]]).
    */
  def positionalGrams(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    Parallelism.spreadBy(df, col(idCol))
      .select(col(idCol).as("id"), toks.as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("n_toks"),
        posexplode(
          when(size(col("__toks")) >= k,
            transform(sequence(lit(0), size(col("__toks")) - k),
              i => array_join(slice(col("__toks"), i + 1, lit(k)), " ")))
            .otherwise(array(array_join(col("__toks"), " "))))
          .as(Seq("pos", "gram")))
  }

  /** Per-document duplicated-span report: span counts, distinct duplicated
    * grams, and the exact token count covered by the union of duplicated
    * spans. A span is "duplicated" when its gram occurs in at least
    * `minDocs` distinct documents (so a doc repeating itself is not
    * self-contaminating at minDocs=2 unless another doc shares the span).
    *
    * Output: (id, n_spans, n_dup_spans, n_dup_grams, covered_tokens,
    * n_tokens, dup_ratio_r).
    */
  def report(df: DataFrame, textCol: String, idCol: String, k: Int,
      minDocs: Int = 2,
      gramKey: Column => Column = xxhash64(_)): DataFrame = {
    // Materialized: the gram relation feeds the dup-key aggregation plus
    // BOTH post-split consumers below — without it each consumer re-runs
    // the tokenize/explode (the exchange inserted by spreadBy is reusable,
    // but the per-row gram synthesis happens downstream of it and would
    // re-run per consumer).
    val grams = Materialize.once(positionalGrams(df, textCol, idCol, k)
      .withColumn("gkey", gramKey(col("gram")))
      // project the raw gram away before materializing: every consumer
      // below keys on gkey only (identity gramKey still stores one copy)
      .select(col("id"), col("pos"), col("n_toks"), col("gkey")))
    val dupKeys = grams
      .groupBy(col("gkey"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("gkey"), lit(true).as("is_dup"))
    val flags = grams.join(dupKeys, Seq("gkey"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
    // Interval-union fold over sorted duplicated-span starts: each span
    // claims [pos, min(pos+k, n_toks)); the (covered, nextFree) state adds
    // only the part beyond what earlier spans already claimed. collect_list
    // is bounded by the document's own span count — per-document state,
    // never corpus-sized.
    // n_dup_grams is aggregated SEPARATELY (distinct dup (id, gkey) pairs →
    // count per id) instead of as a countDistinct beside the other
    // aggregates: mixed distinct/non-distinct aggregation plans an Expand
    // that doubles every row — including the gram-key payload — through
    // the (id) shuffle, while the split form ships the gram key only for
    // the (small) duplicated subset and the main aggregate drops the key
    // column entirely. Same values: countDistinct ignores nulls, so docs
    // without dup spans coalesce to 0 either way.
    val dupGrams = flags.filter(col("is_dup"))
      .select(col("id"), col("gkey")).distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup_grams"))
    flags
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_spans"),
        max(col("n_toks")).as("n_tokens"),
        sort_array(collect_list(when(col("is_dup"), col("pos").cast("long"))))
          .as("__dup_starts"))
      .join(dupGrams, Seq("id"), "left")
      .withColumn("n_dup_grams", coalesce(col("n_dup_grams"), lit(0L)))
      .withColumn("covered_tokens",
        aggregate(col("__dup_starts"),
          struct(lit(0L).as("cov"), lit(0L).as("free")),
          (st, p) => {
            val e = least(p + k, col("n_tokens"))
            struct(
              (st.getField("cov") +
                greatest(lit(0L), e - greatest(st.getField("free"), p))).as("cov"),
              greatest(st.getField("free"), e).as("free"))
          },
          st => st.getField("cov")))
      .select(col("id"), col("n_spans"), col("n_dup_spans"), col("n_dup_grams"),
        col("covered_tokens"), col("n_tokens"),
        round(col("covered_tokens") / col("n_tokens"), 9).as("dup_ratio_r"))
  }
}
