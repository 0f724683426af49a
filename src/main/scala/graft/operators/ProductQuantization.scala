package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization (PQ) for embedding search (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * D-dim vector into `m` subvectors of D/m dims, quantize every subvector
  * to its nearest codebook entry (per-subspace codebooks of `nCodes`
  * centroids), and answer queries with asymmetric distance computation
  * (ADC): the query stays exact, each corpus vector's distance is the sum
  * of per-subspace lookup-table entries.
  *
  * Scale design:
  *  - codebooks are (m × nCodes) rows — always broadcastable;
  *  - encoding is one narrow pass: explode to (id, sub) rows, broadcast
  *    join with the codebook, partial-aggregated argmin — one shuffle on
  *    id, never on vector content. The encoded corpus is m bytes-ish per
  *    vector (the 4×-32× memory squeeze that makes billion-scale ANN fit);
  *  - ADC scoring joins the encoded corpus with a broadcast per-query
  *    lookup table on (sub, code) and sums integer-nano distances
  *    (map-side combined). Exhaustive-ADC by design — compose with
  *    [[Similarity.ivfTopK]] cells to prune candidates (IVF-PQ) when even
  *    the code scan is too big;
  *  - all distances are folded sequentially and rounded to integer nanos
  *    BEFORE any commutative sum, so results are engine-exact (the q96
  *    oracle replays codebook, encode, and ADC end to end in SQL).
  */
object ProductQuantization {

  /** Sequential-fold squared L2 between two double arrays — the fold order
    * is fixed (left to right), so any engine reproduces it bit-for-bit.
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)

  /** Integer-nano squared L2 (round half-up at 1e-9) — exact under
    * commutative re-aggregation.
    */
  private def l2sqNano(a: Column, b: Column): Column =
    round(l2sq(a, b) * 1e9).cast("long")

  /** Per-subspace codebooks from a deterministic seed set: the `nCodes`
    * seed vectors (ordered by id) donate their subvectors as centroids.
    * Returns (sub, code, cvec) — m × nCodes rows. A Lloyd-refined codebook
    * (same loop as [[Similarity.ivfCentroids]] per subspace) plugs in
    * without changing encode/ADC.
    */
  def codebooksFromSeeds(seeds: DataFrame, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Dense 0-based codes over the nCodes-row seed set WITHOUT a window
    // (collect_list → array_sort → posexplode): Window.partitionBy(lit(0))
    // gets constant-folded into an unpartitioned WindowExec, whose "No
    // Partition Defined" warning reads as a scale bug in every bench tail.
    // The single-row aggregate is the same one-task execution over a
    // dimension-sized relation, with no window operator.
    val subs = explode(sequence(lit(0), lit(m - 1))).as("sub")
    seeds
      .select(struct(col(idCol).as("k"),
        transform(col(vecCol), _.cast("double")).as("v")).as("s"))
      .agg(array_sort(collect_list(col("s"))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("code", "s")))
      .select(col("code").cast("long").as("code"), col("s.v").as("v"))
      .select(col("code"), subs, col("v"))
      .select(col("sub").cast("long").as("sub"), col("code"),
        slice(col("v"), (col("sub") * subDim + 1).cast("int"), lit(subDim)).as("cvec"))
  }

  /** Encode the corpus: (id, sub, code) — each subvector's argmin-distance
    * codebook entry (ties break to the lowest code). One broadcast join +
    * one partial-aggregated min-struct; the corpus shuffles only the
    * (id, sub) skeleton.
    */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val subs = corpus
      .select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .select(col("id"), explode(sequence(lit(0L), lit(m - 1L))).as("sub"),
        col("v"))
      .select(col("id"), col("sub"),
        slice(col("v"), (col("sub") * subDim + 1).cast("int"), lit(subDim)).as("svec"))
    subs
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("id"), col("sub"),
        struct(l2sqNano(col("svec"), col("cvec")).as("d"), col("code")).as("__dc"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("__dc")).as("__best"))
      .select(col("id"), col("sub"), col("__best.code").as("code"))
  }

  /** ADC top-k: exact queries against the encoded corpus. Lookup table =
    * queries × codebooks (tiny, broadcast); per corpus vector the distance
    * is the integer sum of its m table entries. Returns
    * (query_id, neighbor_id, adc_r, rank), rank 1..k by ascending ADC.
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, codebooks: DataFrame,
      k: Int, m: Int, subDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lut = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("qv"))
      .select(col("query_id"), explode(sequence(lit(0L), lit(m - 1L))).as("sub"),
        col("qv"))
      .select(col("query_id"), col("sub"),
        slice(col("qv"), (col("sub") * subDim + 1).cast("int"), lit(subDim)).as("qsub"))
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        l2sqNano(col("qsub"), col("cvec")).as("d_nano"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_nano").asc, col("neighbor_id").asc)
    encoded
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d_nano")).as("adc_nano"))
      .select(col("query_id"), col("id").as("neighbor_id"), col("adc_nano"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (col("adc_nano") / 1e9).as("adc_r"), col("rank"))
  }

  /** IVF-PQ — the composition the scaladoc above promises (and the shape
    * billion-scale ANN actually ships): route each query to its `nprobe`
    * highest-cosine IVF cells, then ADC-score ONLY those cells' encoded
    * vectors. Candidate generation is [[Similarity.assignCells]]' inverted
    * index joined with the broadcast query-routing table; the candidate
    * relation (≈ nprobe/nlist of the corpus per query) drives the encoded
    * join, so the exhaustive code scan of [[adcTopK]] never happens.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, k: Int, m: Int, subDim: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // materialize the (nlist-row) centroid frame once: it feeds two
    // consumers (inverted index + query routing), and — critically — its
    // upstream may be a filtered fact scan, which must never sit
    // uncollapsed under broadcast() (linear growth ⇒ OOM at scale)
    val cents = Materialize.once(centroids)
    val inverted = Similarity.assignCells(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("id"), col("cell"))
    val qCells = queries
      .crossJoin(broadcast(cents))
      .withColumn("__cos", Similarity.cosine(col(vecCol), col("centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("cell").asc)))
      .filter(col("__r") <= nprobe)
      .select(col(idCol).as("query_id"), col("cell"))
    val cands = inverted.join(broadcast(qCells), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"))

    val encoded = encode(corpus, codebooks, m, subDim, idCol, vecCol)
    val lut = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("qv"))
      .select(col("query_id"), explode(sequence(lit(0L), lit(m - 1L))).as("sub"),
        col("qv"))
      .select(col("query_id"), col("sub"),
        slice(col("qv"), (col("sub") * subDim + 1).cast("int"), lit(subDim)).as("qsub"))
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        l2sqNano(col("qsub"), col("cvec")).as("d_nano"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_nano").asc, col("neighbor_id").asc)
    cands.join(encoded, Seq("id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d_nano")).as("adc_nano"))
      .select(col("query_id"), col("id").as("neighbor_id"), col("adc_nano"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        (col("adc_nano") / 1e9).as("adc_r"), col("rank"))
  }
}
