package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004) as an operator
  * COMPOSITION: token co-occurrence graph (positions within `window` in
  * the same document, both directions, multiplicity = edge weight) fed
  * into the fixed-round micro-quantized [[graft.operators.PageRank]].
  * No new iterative machinery — the graph construction is per-document
  * lead() windows (no self-join), the vocabulary id assignment is the
  * distributed [[graft.operators.GlobalOrder]] dense rank (the vocabulary
  * GROWS with corpus diversity, so no single-row array agg and no
  * mandatory broadcast may sit on that path), and the ranking rounds are
  * the already-gated PageRank rounds, so the whole extraction replays as
  * SQL CTEs.
  */
object TextRank {

  /** @return (token, rank_micro), top `topK` by (rank desc, token asc). */
  def keywords(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 2, iters: Int = 3, topK: Int = 20): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = docs
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    // vocabulary ids: distributed dense rank over the distinct tokens —
    // the two-phase prefix sum, NOT the single-row sorted-array idiom:
    // vocabulary cardinality grows with corpus diversity, and a
    // web-scale vocab in one array row is a driver/executor OOM. Values
    // are identical to the sorted-distinct assignment (1-based rank in
    // ascending token order).
    val vocab = graft.operators.GlobalOrder
      .runningRowNumber(toks.select(col("tok")).distinct(), Seq("tok"), "tid")
      .select(col("tid"), col("tok"))
    val wDoc = W.partitionBy(col("doc")).orderBy(col("pos"))
    // undirected co-occurrence edges via lead() — no positional self-join
    val pairs = (1 to window).map { o =>
      toks.withColumn("nxt", lead(col("tok"), o).over(wDoc))
        .filter(col("nxt").isNotNull)
        .select(col("tok").as("a"), col("nxt").as("b"))
    }.reduce(_.unionByName(_))
    val edgesTok = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b")))
    // no broadcast HINT on the vocab joins: the vocab grows with the
    // corpus, so the join must be free to shuffle; AQE still broadcasts
    // it at runtime whenever it is actually small.
    val edges = edgesTok
      .join(vocab.select(col("tok").as("a"), col("tid").as("src")), "a")
      .join(vocab.select(col("tok").as("b"), col("tid").as("dst")), "b")
      .select("src", "dst")
    graft.operators.PageRank.run(edges, "src", "dst", iters)
      .join(vocab.select(col("tid").as("node"), col("tok")), "node")
      .select(col("tok").as("token"), col("rank_micro"))
      .orderBy(col("rank_micro").desc, col("token").asc)
      .limit(topK)
  }
}
