package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding-space statistics (class centroids, norms) — the
  * aggregation side of an embedding pipeline (cluster profiling, centroid
  * seeding for IVF, drift monitoring).
  *
  * Exactness: float32 components convert to float64 exactly; each component
  * is scaled to integer micro-units before summing, so centroid sums are
  * independent of partitioning/reduction order (the [[graft.functions.ExactAgg]]
  * rationale applied per dimension) and bit-match any other engine.
  *
  * Scale design: posexplode fans each vector to (group, dim) cells; the
  * aggregation shuffles on (group, dim) — cardinality #groups × dim, tiny —
  * with map-side partial sums doing the real reduction. No vector is ever
  * collected to the driver.
  */
object EmbeddingStats {

  /** Elementwise mean vector per group, long form:
    * (group, dim, centroid, n_vectors). `centroid` is the micro-rounded
    * component mean.
    */
  def centroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("grp"), col("dim"))
      .agg(
        sum(round(col("v").cast("double") * 1e6).cast("long")).as("s_micro"),
        count(lit(1)).as("n_vectors"))
      .select(col("grp"), col("dim").cast("long").as("dim"),
        (col("s_micro") / 1e6 / col("n_vectors")).as("centroid"),
        col("n_vectors"))
}
