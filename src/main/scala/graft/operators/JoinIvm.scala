package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for materialized INNER equi-joins under
  * append-only deltas — the standard delta-processing identity
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
  *
  * (with B_new = B_old ∪ ΔB; the ΔA⋈ΔB term is inside the first join).
  * Maintaining a 100 TB join view costs O(|Δ|·fanout) instead of a full
  * re-join: both delta joins key on the join columns, and a
  * batch-sized ΔA/ΔB broadcasts, so the big relations are only probed,
  * never re-shuffled against each other. Deletes/updates are out of
  * scope by design — route them through [[Cdc]] (last-writer merge) or
  * [[graft.lake.DeleteVectors]] (merge-on-read) BEFORE the join view.
  */
object JoinIvm {

  /** The join's delta under (ΔA, ΔB). Column set = A's ++ B's non-key
    * columns, like an inner join on `keys`. */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame = {
    val bNew = bOld.unionByName(bDelta)
    aDelta.join(bNew, keys).unionByName(aOld.join(bDelta, keys))
  }

  /** J_new = J_old ∪ Δ — the maintained view after applying the deltas.
    * `jOld` must be the inner join of (aOld, bOld) on `keys` with the
    * same column layout this function produces. */
  def maintain(jOld: DataFrame, aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    jOld.unionByName(deltaJoin(aOld, aDelta, bOld, bDelta, keys))
}
