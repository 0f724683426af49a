package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining: bigrams whose observed frequency beats the
  * unigram-independence expectation — the classic corpus-analytics pass for
  * tokenizer vocabulary candidates and multi-word-expression discovery
  * (Church & Hanks 1990).
  *
  * pmi(a,b) = ln( c_ab · N / (c_a · c_b) ), computed over the corpus-wide
  * bigram stream (token i, token i+1 within a document).
  *
  * Exactness: counts are exact integers; c_ab·N and c_a·c_b stay < 2⁵³ for
  * any realistic corpus shard, so the double division is IEEE-identical
  * across engines; the single `ln` is micro-rounded ([[TfIdf]] rationale).
  *
  * Scale shape: bigram explode → one groupBy for bigram counts; unigram
  * counts aggregate from the SAME stream (first-token projection plus the
  * per-document last token); joins are shuffle equi-joins on token — the
  * unigram side is vocabulary-sized and AQE will broadcast it when small.
  */
object Collocations {

  /** Collocations with `c_ab >= minCount`, strongest first:
    * (w1, w2, c_ab, c_a, c_b, pmi) with deterministic
    * (−pmi_micro, w1, w2) ordering, limited to `topK`.
    */
  def pmi(docs: DataFrame, textCol: String, idCol: String,
      minCount: Long, topK: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val bi = toks
      .select(explode(
        when(size(col("t")) >= 2,
          transform(sequence(lit(0), size(col("t")) - 2),
            i => struct(element_at(col("t"), i + 1).as("w1"),
              element_at(col("t"), i + 2).as("w2"))))
          .otherwise(array())).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val n = uni.agg(sum(col("c_w")).as("__n"))
    bi
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_micro",
        round(log((col("c_ab") * col("__n")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")) * 1e6).cast("long"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        (col("pmi_micro") / 1e6).as("pmi"))
  }
}
