package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via broadcast of the (small)
  *    query set against the corpus: one distributed map + TakeOrdered.
  *    The baseline, and the verifier for the approximate path.
  *  - [[lshTopK]] — random-hyperplane LSH: 16-bit sign signatures bucket the
  *    corpus; each query only scans its bucket (plus Hamming-1 neighbor
  *    buckets for recall). At 100 TB the bucket join replaces the full scan;
  *    buckets are re-usable across queries (precompute + write once).
  *
  * All dot products fold in array order (deterministic IEEE), computed in
  * double after an explicit float→double cast.
  */
object Similarity {

  /** Elementwise-fold cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(d(a), d(b)) / (sqrt(dot(d(a), d(a))) * sqrt(dot(d(b), d(b))))
  }

  /** Exact top-k neighbors for each query row. `queries` must be small
    * (broadcast); `corpus` is the big side and is only mapped, never
    * shuffled. Norms are computed ONCE per row via the native
    * [[graft.expressions.DotProduct]] kernel; each pair then pays a single
    * fused dot loop — N·Q + N + Q kernel passes instead of 3·N·Q. The
    * `dot/(√aa·√bb)` structure is the same as the oracle's, so results stay
    * bit-identical. Ties break on corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.expressions.DotProduct
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", sqrt(DotProduct(col("q_vec"), col("q_vec"))))
    val c = corpus.select(col(idCol), col(vecCol).as("c_vec"))
      .withColumn("c_norm", sqrt(DotProduct(col("c_vec"), col("c_vec"))))
    val scored = c
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      // zero-norm guard: double x/0 is IEEE NaN (sorts ABOVE every real
      // cosine in desc order) — null it out like the kernel does
      .withColumn("cos_sim",
        when(col("c_norm") =!= 0 && col("q_norm") =!= 0,
          DotProduct(col("c_vec"), col("q_vec")) / (col("c_norm") * col("q_norm"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: `bits` planes × `dims`
    * components in [-1, 1), derived from a fixed-seed generator.
    */
  private[operators] def planes(bits: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dims)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bit LSH signature of a float-array column under the fixed planes.
    * The vector length MUST equal `dims` — `assert_true` fails the job
    * loudly on mismatch (zip_with would otherwise null-pad, silently
    * degenerating every signature to bucket 0 and turning the bucket join
    * into an all-pairs product).
    */
  def lshSignature(vec: Column, bits: Int, dims: Int, seed: Long = 42L): Column = {
    val ps = planes(bits, dims, seed)
    val checked = when(
      assert_true(size(vec) === dims,
        lit(s"lshSignature: embedding length != dims=$dims")).isNull, vec)
    (0 until bits).map { i =>
      val plane = lit(ps(i))
      val dot = aggregate(
        zip_with(checked, plane, (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      shiftleft(when(dot >= 0, 1L).otherwise(0L), i)
    }.reduce(_ bitwiseOR _)
  }

  /** Approximate top-k via multi-table hyperplane LSH: `tables` independent
    * signature tables (separately seeded planes); the corpus is bucketed
    * under every table, each query probes its own bucket plus all Hamming-1
    * neighbors in every table, candidates are unioned and exactly re-scored.
    * Recall < 1 by construction; verified against [[bruteForceTopK]] in
    * SimilaritySpec.
    *
    * Scale: the bucketed corpus is computed once per table (a narrow map +
    * one equi-join per probe); candidates ≪ corpus is the entire point —
    * the full scan of bruteForce is replaced by |tables × probes| bucket
    * lookups.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dims: Int,
      tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val tableSigs = (0 until tables).map { t =>
      struct(lit(t).as("tbl"), lshSignature(col(vecCol), bits, dims, seed = 42L + t).as("sig"))
    }
    val bucketed = corpus
      .withColumn("bk", explode(array(tableSigs: _*)))
      .select(col(idCol), col(vecCol), col("bk.tbl").as("tbl"), col("bk.sig").as("bucket"))
    // query probes per table: own bucket + flip each bit once
    val probeMasks = typedLit(0L +: (0 until bits).map(i => 1L << i))
    val q = queries
      .withColumn("bk", explode(array(tableSigs: _*)))
      .withColumn("bucket", explode(transform(probeMasks, m => col("bk.sig").bitwiseXOR(m))))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("bk.tbl").as("tbl"), col("bucket"))
    val scored = bucketed
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec"), col("q_vec"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos_sim",
        graft.expressions.CosineSimilarity(col("c_vec"), col("q_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
