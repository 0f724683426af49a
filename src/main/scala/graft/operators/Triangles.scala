package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting on an undirected edge list.
  *
  * Algorithm: degree-ordered edge orientation (the "forward" / compact-
  * forward algorithm — Latapy 2008; the same idea behind Cohen's MapReduce
  * triangle counting). Each undirected edge is oriented from its
  * lower-(degree, id) endpoint to the higher one; a triangle {u, v, w} is
  * then found EXACTLY once as a wedge u→v, u→w (v before w in the same
  * order) closed by the oriented edge v→w.
  *
  * Why this is the 100 TB shape: with orientation by degree, every node's
  * out-degree is O(√m), so wedge fan-out is Σ C(outdeg, 2) = O(m^1.5)
  * worst-case instead of Σ C(deg, 2) which explodes on hub nodes (a hub
  * with degree 10^6 would otherwise emit 5·10^11 wedges from one key).
  * All three steps are hash-shuffles on node keys — no global state, no
  * driver work, skew bounded by the orientation itself.
  */
object Triangles {

  /** Canonical undirected edge list: (a < b), deduplicated, self-loops
    * dropped. Accepts any two integral columns.
    */
  def canonicalEdges(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges
      .select(col(aCol).cast("long").as("__u"), col(bCol).cast("long").as("__v"))
      .filter(col("__u") =!= col("__v"))
      .select(least(col("__u"), col("__v")).as("a"),
        greatest(col("__u"), col("__v")).as("b"))
      .distinct()

  /** Per-node triangle participation counts: (node, triangles) for every
    * node in at least one triangle. Input may be raw (undirected,
    * possibly duplicated) edges; canonicalized internally.
    */
  def perNode(edges: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val e = canonicalEdges(edges, aCol, bCol)
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    // orient low (deg, id) → high (deg, id); carry the head's order key so
    // the wedge legs can be totally ordered without a re-join
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("src"),
      when(fwd, col("b")).otherwise(col("a")).as("dst"),
      when(fwd, col("db")).otherwise(col("da")).as("ddst"))
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("src").as("u"), col("v"), col("w"))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Node-coloring triangle estimator (Doulion-style sampling by node,
    * Tsourakakis 2009 lineage): keep only nodes whose id satisfies
    * `id % q == r`... — here the caller pre-filters the item domain with a
    * deterministic color predicate and scales the observed count by q³.
    * Provided as the count-only companion of [[perNode]]: returns one row
    * (sampled_triangles, scale, estimate = sampled · scale³).
    */
  def coloredEstimate(edges: DataFrame, aCol: String, bCol: String,
      scale: Long): DataFrame =
    perNode(edges, aCol, bCol)
      .agg((coalesce(sum(col("triangles")), lit(0L)) / 3).cast("long")
        .as("sampled_triangles"))
      .select(col("sampled_triangles"), lit(scale).as("scale"),
        (col("sampled_triangles") * scale * scale * scale).as("estimate"))
}
