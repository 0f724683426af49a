package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication of an embedding corpus (Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540). Cluster the corpus into cells, then
  * prune within-cell pairs whose cosine similarity reaches `tau`, keeping a
  * deterministic representative (the lowest id) per duplicate neighborhood.
  *
  * The verdict rule is the order-free simplification of the paper's greedy
  * pass: a vector is dropped iff ANY strictly-lower-id member of its cell
  * is `tau`-similar to it (whether or not that member is itself dropped).
  * This makes the result independent of scan order and partitioning, and
  * exactly replayable in SQL. Duplicates that land in DIFFERENT cells
  * survive — the paper's documented recall trade-off; recall is a function
  * of the clustering, not of this operator.
  *
  * Scale posture: the corpus-level n² never materializes. Pairs are
  * confined to within-cell candidates via a hash equi-join on the cell id;
  * with nlist ∝ n/c the expected cell size c is a constant, so candidate
  * pairs grow ~linearly in n. Two shuffles total (cell join, verdict agg);
  * the per-pair cosine runs on the codegen'd
  * [[graft.expressions.CosineSimilarity]] kernel.
  */
object SemDedup {

  /** Per-vector verdict over the clustered corpus.
    *
    * @param emb       corpus with `idCol` (numeric id) and `vecCol`
    *                  (`array<float>`)
    * @param centroids cell table: (cell: long, centroid: array<double>) —
    *                  e.g. [[Similarity.ivfCentroids]] output or any
    *                  deterministic seed rule
    * @param tau       cosine threshold at/above which a pair is a
    *                  semantic duplicate
    * @return one row per input vector:
    *         (idCol, cell, n_dup_lower: long, kept: int) where
    *         `n_dup_lower` counts tau-similar within-cell neighbors with
    *         strictly lower id and `kept` = 1 iff that count is 0
    */
  def dedup(emb: DataFrame, centroids: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    // materialize the (nlist-row) centroid frame: its upstream may be a
    // filtered fact scan, which must never sit uncollapsed under the
    // assignment's broadcast (linear growth ⇒ OOM at scale)
    verdict(Similarity.assignCells(emb, Materialize.once(centroids),
      idCol, vecCol), tau, idCol, vecCol)

  /** [[dedup]] with the two-level ROUTED assignment
    * ([[Similarity.assignCellsRouted]]) — the deployment shape when nlist
    * grows with the corpus (constant cell size): assignment cost drops
    * from n·nlist to ~2n·√nlist, i.e. n^1.5 instead of n² over the whole
    * job. Approximate routing can place a vector in a second-best cell
    * (recall dial: `probes`); the within-cell pruning semantics are
    * unchanged.
    */
  def dedupRouted(emb: DataFrame, centroids: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 2): DataFrame =
    verdict(Similarity.assignCellsRouted(emb, Materialize.once(centroids),
      idCol, vecCol, probes = probes), tau, idCol, vecCol)

  private def verdict(assigned: DataFrame, tau: Double,
      idCol: String, vecCol: String): DataFrame = {
    val lo = assigned.select(col("cell"), col(idCol).as("__lo_id"),
      col(vecCol).as("__lo_vec"))
    val hi = assigned.select(col("cell"), col(idCol).as("__hi_id"),
      col(vecCol).as("__hi_vec"))
    // within-cell candidate pairs only; >= on the unrounded double is safe
    // cross-engine because both sides run the identical fold/divide chain
    // (null cosine from a zero-norm side compares as false)
    val dropped = lo.join(hi, Seq("cell"))
      .filter(col("__lo_id") < col("__hi_id"))
      .filter(graft.expressions.CosineSimilarity(
        col("__lo_vec"), col("__hi_vec")) >= tau)
      .groupBy(col("__hi_id").as(idCol))
      .agg(count(lit(1)).as("n_dup_lower"))
    assigned.select(col(idCol), col("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("n_dup_lower"), lit(0L)).as("n_dup_lower"),
        when(coalesce(col("n_dup_lower"), lit(0L)) === 0, 1).otherwise(0)
          .as("kept"))
  }
}
