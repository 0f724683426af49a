package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce a D-dim embedding to r
  * dims by dotting with r fixed random hyperplanes. The standard cheap
  * pre-step before clustering / coarse ANN when D is large — distances are
  * preserved within (1±ε) at r = O(log n / ε²).
  *
  * Scale: pure map stage — r sequential-fold dot products per row, no
  * shuffle, whole-stage codegen'd HOF arithmetic, no UDF. With
  * [[Similarity.portablePlanes]] the planes are integer-formula
  * deterministic, so any engine regenerates them bit-identically (the q99
  * oracle replays planes + dots in SQL).
  */
object RandomProjection {

  /** Sequential-fold dot of a float-array column with a constant
    * double-array plane (left-to-right — the engine-portable order).
    */
  private def dot(vec: Column, plane: Array[Double]): Column =
    aggregate(zip_with(transform(vec, _.cast("double")), typedLit(plane),
      (x, w) => x * w), lit(0.0), (acc, t) => acc + t)

  /** Wide form: input row + `projected` array<double> of length r.
    *
    * The vector length MUST equal the plane dimensionality — the guard
    * fails the job loudly on mismatch, mirroring
    * [[Similarity.lshSignature]]'s contract (zip_with would otherwise
    * null-pad and silently emit null projected values).
    */
  def project(emb: DataFrame, planes: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame = {
    require(planes.nonEmpty, "need at least one projection plane")
    val dims = planes.head.length
    require(planes.forall(_.length == dims),
      s"all plane rows must have $dims components")
    emb.withColumn("projected",
      when(size(col(vecCol)) === lit(dims),
        array(planes.map(p => dot(col(vecCol), p)): _*))
        .otherwise(raise_error(concat(
          lit(s"RandomProjection: vector length "), size(col(vecCol)),
          lit(s" != plane dimensionality $dims")))))
  }

  /** Long form for exact comparison: (id, rdim, value_r) — one row per
    * reduced dimension, 9dp-rounded.
    */
  def projectLong(emb: DataFrame, planes: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    project(emb, planes, vecCol)
      .select(col(idCol), posexplode(col("projected")).as(Seq("rdim", "value")))
      .select(col(idCol), col("rdim").cast("long").as("rdim"),
        round(col("value"), 9).as("value_r"))
}
