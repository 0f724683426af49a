package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity self-join (the All-Pairs /
  * PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): exact
  * Jaccard ≥ τ pairs over shingle sets WITHOUT MinHash and WITHOUT the
  * full shingle equi-join.
  *
  * [[Dedup.allPairsJaccard]] joins on EVERY shingle — cost Σ_s df(s)²,
  * dominated by frequent shingles. The prefix filter instead orders the
  * universe by document frequency (rarest first) and joins only each
  * set's PREFIX — its first |x| − ⌈τ·|x|⌉ + 1 tokens in that order: two
  * sets with J ≥ τ must overlap in ≥ τ·max(|A|,|B|) tokens, so missing
  * each other's entire prefix is impossible. Candidate cost collapses to
  * Σ_{s ∈ prefixes} df_pref(s)² over the RAREST tokens, the published
  * several-orders-of-magnitude win; the length filter
  * τ·max(|A|,|B|) ≤ min(|A|,|B|) prunes before verification.
  *
  * Everything is exact integer arithmetic (τ as micro-int; ⌈τn⌉ by
  * integer division; the final test inter·10⁶ ≥ τ·union) over PORTABLE
  * string shingles, so the whole join — global frequency order included
  * — replays in any SQL engine.
  */
object SetSimilarityJoin {

  /** Exact Jaccard-τ pairs: (id_a, id_b, shared, n_a, n_b,
    * jaccard_micro), id_a < id_b.
    *
    * @param thresholdMicro τ · 10⁶ (e.g. 800000L for τ = 0.8)
    */
  def selfJoin(df: DataFrame, textCol: String, idCol: String,
      thresholdMicro: Long, shingleSize: Int = 3): DataFrame = {
    val thr = lit(thresholdMicro)
    val M = lit(1000000L)
    // per-doc distinct shingles; three consumers → materialize once.
    // Spread before the tokenize/shingle explode: a few-file corpus scan
    // would otherwise serialize the whole shingling onto one core.
    val sh = Materialize.once(
      Parallelism.spreadBy(df, col(idCol)).select(col(idCol).as("id"),
        explode(Dedup.shingles(col(textCol), shingleSize)).as("sh")))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("__dfc"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("__dfc"), col("sh"))
    // set size n = rows per id — computed as a second window over the SAME
    // id partitioning (no extra groupBy relation, no extra (id) join)
    val prefix = sh
      .join(dfreq, Seq("sh"))
      .withColumn("__rn", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
      // p = n − ⌈τn⌉ + 1, ⌈τn⌉ = (τ_micro·n + 10⁶−1) div 10⁶ — exact ints
      .filter(col("__rn") <=
        col("n") - expr(s"($thresholdMicro * n + 999999) div 1000000") + 1)
      .select(col("sh"), col("id"), col("n"))
    val cand = prefix.select(col("sh"), col("id").as("id_a"), col("n").as("n_a"))
      .join(prefix.select(col("sh"), col("id").as("id_b"), col("n").as("n_b")),
        Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      // length filter: J ≤ min/max ⇒ τ·max ≤ min or the pair can't qualify
      .filter(thr * greatest(col("n_a"), col("n_b")) <=
        M * least(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .distinct()
    // verify: exact intersection over the candidates only
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
    inter
      .filter(col("shared") * M >=
        thr * (col("n_a") + col("n_b") - col("shared")))
      .select(col("id_a"), col("id_b"), col("shared"), col("n_a"), col("n_b"),
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double") * 1e6)
          .cast("long").as("jaccard_micro"))
  }
}
