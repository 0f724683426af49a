package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted ANN index — [[Similarity]]'s IVF machinery split into the
  * build-once / probe-many lifecycle a production vector store runs (the
  * [[Dedup.bandIndex]]/[[Dedup.probeIndex]] posture applied to
  * embeddings): the centroid table and the inverted (cell → vector)
  * assignment land as parquet, and each query batch reads the stored
  * index — the corpus is never re-clustered or re-assigned.
  *
  * Scale design: assignments are written `partitionBy(cell)`, so a probe
  * of `nprobe` cells prunes to those directories (dynamic partition
  * pruning through the broadcast cell join); the centroid table is
  * nlist-row (broadcast by construction); per batch the candidate scan
  * touches ~nprobe/nlist of the corpus, scored with the codegen'd
  * [[graft.expressions.CosineSimilarity]] kernel and cut to k by a
  * per-query window over candidates only.
  */
object AnnIndex {

  /** Build the index at `root`: `root/centroids` (cell, centroid) and
    * `root/assignments` (id, vec, cell), cell-partitioned.
    */
  def build(corpus: DataFrame, centroids: DataFrame, root: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    Similarity.assignCells(corpus, centroids, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/assignments")
  }

  /** Incremental maintenance: assign a NEW vector batch against the
    * STORED centroids and append it into the cell partitions — the daily
    * operation of a growing vector store. Nothing existing is re-read or
    * re-clustered: the append touches only the (few) cell directories the
    * batch lands in, so cost is O(|batch| × nlist) assignment + the
    * appended bytes, independent of corpus size. Because assignment is
    * deterministic against the same centroid table, an index maintained
    * by appends is EQUAL to one rebuilt from scratch over the union —
    * the invariant q129 gates and AnnIndexSpec asserts.
    *
    * (Centroid drift is deliberate out-of-scope here: re-clustering is a
    * rebuild — [[build]] — not maintenance; IVF deployments re-train
    * centroids on a much slower cadence than they ingest.)
    */
  def append(newBatch: DataFrame, root: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = newBatch.sparkSession
    val cents = spark.read.parquet(s"$root/centroids")
    Similarity.assignCells(newBatch, cents, idCol, vecCol)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/assignments")
  }

  /** Probe the stored index with a query batch: route each query to its
    * `nprobe` highest-cosine cells, exactly re-score only those cells'
    * stored vectors, return (query_id, neighbor_id, cos_sim, rank ≤ k).
    */
  def probe(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(s"$root/centroids")
    val inverted = spark.read.parquet(s"$root/assignments")
    val qCells = queries
      .crossJoin(broadcast(cents))
      .withColumn("__cos", Similarity.cosine(col(vecCol), col("centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("cell").asc)))
      .filter(col("__r") <= nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("cell").cast("long").as("cell"))
    val scored = inverted.withColumn("cell", col("cell").cast("long"))
      .join(broadcast(qCells), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos_sim",
        graft.expressions.CosineSimilarity(col(vecCol), col("q_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
