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
  * dimension-sized sorted-distinct idiom, and the ranking rounds are the
  * already-gated PageRank rounds, so the whole extraction replays as SQL
  * CTEs.
  */
object TextRank {

  /** @return (token, rank_micro), top `topK` by (rank desc, token asc). */
  def keywords(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 2, iters: Int = 3, topK: Int = 20): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = docs
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    // vocabulary ids: sorted-distinct (dimension-sized; no global window)
    val vocab = toks.select(col("tok")).distinct()
      .agg(array_sort(collect_list(col("tok"))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("tid", "tok")))
      .select((col("tid") + 1).cast("long").as("tid"), col("tok"))
    val wDoc = W.partitionBy(col("doc")).orderBy(col("pos"))
    // undirected co-occurrence edges via lead() — no positional self-join
    val pairs = (1 to window).map { o =>
      toks.withColumn("nxt", lead(col("tok"), o).over(wDoc))
        .filter(col("nxt").isNotNull)
        .select(col("tok").as("a"), col("nxt").as("b"))
    }.reduce(_.unionByName(_))
    val edgesTok = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b")))
    val edges = edgesTok
      .join(broadcast(vocab.select(col("tok").as("a"), col("tid").as("src"))), "a")
      .join(broadcast(vocab.select(col("tok").as("b"), col("tid").as("dst"))), "b")
      .select("src", "dst")
    graft.operators.PageRank.run(edges, "src", "dst", iters)
      .join(broadcast(vocab.select(col("tid").as("node"), col("tok"))), "node")
      .select(col("tok").as("token"), col("rank_micro"))
      .orderBy(col("rank_micro").desc, col("token").asc)
      .limit(topK)
  }
}
