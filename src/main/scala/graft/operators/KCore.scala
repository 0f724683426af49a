package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling (Seidman 1983): repeatedly delete nodes
  * with degree < k; what survives R rounds is (an over-approximation
  * converging to) the k-core — the standard graph-cleaning step before
  * community detection / PageRank on web graphs (drop the whiskers, keep
  * the dense core).
  *
  * Deterministic FIXED round count — like [[PageRank]]'s unrolled
  * iterations — so the whole peel replays as a finite SQL CTE chain;
  * each round is one degree groupBy + one semi-join per endpoint, all
  * hash-shuffles on node keys, shuffle ∝ |E| per round, no driver-side
  * convergence peeking.
  */
object KCore {

  /** Surviving (node, degree) after `rounds` peels at threshold k over
    * the canonical undirected edge list (via
    * [[Triangles.canonicalEdges]]). Degrees reported are IN the surviving
    * subgraph (the final round's edge set).
    */
  def peel(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && k >= 1, s"need rounds>=1, k>=1; got $rounds, $k")
    // eager per-round truncation (the Dedup.clusters idiom): without it
    // every degree groupBy lazily re-derives the FULL upstream chain —
    // pair mining included — once per round per consumer (observed 76 s
    // vs 3 s on the q154 fixture)
    var e = Triangles.canonicalEdges(edges, aCol, bCol).localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      e = e
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      i += 1
    }
    e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
  }
}
