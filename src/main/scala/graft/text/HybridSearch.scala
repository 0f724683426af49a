package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al., 2009) — the standard way to
  * combine heterogeneous retrieval signals (BM25 lexical ranks, ANN
  * semantic ranks, phrase hits) without score calibration: each input
  * list contributes 1/(k + rank) per document; documents missing from a
  * list contribute nothing from it.
  *
  * Scores are exact micro-scaled integers (`round(1e6/(k+rank))` summed
  * as BIGINTs — order-free and engine-exact), so fused rankings replay
  * bit-for-bit in SQL (q144). Ties break on ascending id.
  *
  * Scale: inputs are already top-k lists (bounded relations); fusion is
  * one union + one groupBy on the id — nothing touches the corpus.
  */
object HybridSearch {

  /** Fuse ranked lists. Each input is (idCol, rankCol) with rank ≥ 1.
    * Output: (id, rrf_micro, n_lists, rank) — fused rank over the union
    * of all listed documents.
    */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "no lists to fuse")
    val contrib = lists.map(_.select(col(idCol).as("id"),
      round(lit(1e6) / (lit(k) + col(rankCol))).cast("long").as("c")))
      .reduce(_.unionByName(_))
    val fused = contrib.groupBy(col("id"))
      .agg(sum(col("c")).as("rrf_micro"), count(lit(1)).as("n_lists"))
    // fused relation is bounded by Σ|list| (top-k inputs) — rank with the
    // house collect_list → array_sort → posexplode idiom, NOT a global
    // window (struct sorts (−score, id): score desc, id asc)
    fused.select(struct((-col("rrf_micro")).as("ns"), col("id"),
        col("rrf_micro"), col("n_lists")).as("s"))
      .agg(array_sort(collect_list(col("s"))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("pos", "s")))
      .select(col("s.id").as("id"), col("s.rrf_micro").as("rrf_micro"),
        col("s.n_lists").as("n_lists"), (col("pos") + 1).cast("long").as("rank"))
  }
}
