package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-corpus assembly: domain mixing to target proportions and
  * length-bucketed batching — the two passes that turn a cleaned corpus
  * into training input.
  *
  * Scale design:
  *  - mixing ranks within each domain by a content-independent md5 priority
  *    (deterministic, engine-portable, no RNG state), one shuffle on the
  *    domain key; at extreme per-domain cardinality swap the exact
  *    `row_number` for a hash-threshold cut (select where priority <
  *    quantile), which is a narrow map after a tiny quantile estimate;
  *  - batching buckets by FIXED length ranges (narrow map, no global sort),
  *    then assigns batch ids within (bucket) — the window partitions by
  *    bucket, so parallelism is the bucket count × domain spread, never a
  *    single global ordering.
  */
object Assembly {

  /** Deterministic domain-mixing sample: for each (domain → weight) entry,
    * keep the `floor(weight × budget)` highest-priority documents of that
    * domain, priority = md5 of the id rendered as a string (stable across
    * engines and runs). Domains absent from `weights` are dropped; a domain
    * with fewer rows than its quota keeps them all (the shortfall surfaces
    * in the output counts rather than failing the job).
    */
  def mixByWeights(df: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1), "weights in [0,1]")
    val quota = typedLit(weights.map { case (d, w) => d -> math.floor(w * budget).toLong })
    val pri = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(domainCol)).orderBy(pri.asc, col(idCol).asc)
    df.filter(col(domainCol).isInCollection(weights.keys.toSeq))
      .withColumn("priority", pri)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= quota(col(domainCol)))
      .select(col(idCol), col(domainCol), col("rank"))
  }

  /** Per-group cap: keep at most `k` rows per group, chosen by the same
    * content-independent md5 priority as [[mixByWeights]] (stable across
    * engines and runs). Unlike the window idiom (full per-group sort,
    * full-width shuffle), this runs on [[graft.plans.TopKPerKey]]'s
    * bounded heaps: each input partition forwards at most k rows per
    * group, so shuffle volume is ≤ k·groups per partition regardless of
    * group size — the shape a per-domain cap needs when one domain holds
    * a third of the corpus. Returns the input columns plus `priority`.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "cap must be positive")
    val pri = md5(col(idCol).cast("string").cast("binary"))
    graft.plans.TopKPerKey(df.withColumn("priority", pri), k,
      keyCols = Seq(groupCol), orderBys = Seq(("priority", true), (idCol, true)))
  }

  /** Deterministic stratified sample: keep a row iff the md5-derived hash
    * of its key falls under the stratum's threshold — `hash(key) mod denom
    * < round(fraction × denom)`. A narrow map (no shuffle, no RNG state),
    * stable across engines/runs/partitionings, and consistent under corpus
    * growth: a row's keep/drop decision never changes when other rows
    * arrive — the property `sampleBy` (partition-sequential RNG) cannot
    * give. Strata absent from `fractions` are dropped.
    */
  def stratifiedSampleByHash(df: DataFrame, stratumCol: String, keyCol: String,
      fractions: Map[String, Double], denom: Long = 10000L): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val thr = typedLit(fractions.map { case (k, f) => k -> math.round(f * denom) })
    val h = conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % denom
    df.filter(col(stratumCol).isInCollection(fractions.keys.toSeq))
      .filter(h < thr(col(stratumCol)))
  }

  /** Leakage-free holdout split: the assignment unit is the GROUP
    * (host/source/document family), never the row — templated or
    * near-duplicate rows inside one group can therefore never straddle
    * train/test (the leakage the per-row split of
    * [[graft.queries.ScaleQueries.q60HashSplit]] cannot prevent).
    * md5-bucketed per mille: engine-portable, RNG-free, and
    * growth-consistent — a group's split never changes as the corpus
    * grows. Map-only; no shuffle.
    */
  def groupHoldout(df: DataFrame, groupCol: String,
      trainPerMille: Int = 800, validPerMille: Int = 100): DataFrame = {
    require(trainPerMille >= 0 && validPerMille >= 0 &&
      trainPerMille + validPerMille <= 1000, "per-mille budgets out of range")
    val b = conv(substring(md5(col(groupCol).cast("string").cast("binary")),
      1, 8), 16, 10).cast("long") % 1000
    df.withColumn("split",
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + validPerMille, "valid")
        .otherwise("test"))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis A-ES keys): each row gets key = ln(u)/w with u an
    * md5-derived uniform in (0, 1], and the k LARGEST keys win —
    * equivalent to u^(1/w) ordering, so selection probability is
    * proportional to weight, without replacement, in one distributed
    * top-k (TakeOrdered — no shuffle of the corpus). RNG-free: the same
    * row always draws the same u, so samples are reproducible and
    * growth-consistent. Keys are nano-rounded for engine-exact ordering
    * (ln's last-ulp libm differences vanish at 1e-9 granularity —
    * the TfIdf margin argument).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    val hv = conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    val u = (hv + lit(1L)).cast("double") / lit(math.pow(2, 60))
    val keyNano = round(log(u) / weight * 1e9).cast("long")
    df.select(col(idCol), weight.cast("double").as("w"),
        keyNano.as("key_nano"))
      .orderBy(col("key_nano").desc, col(idCol).asc)
      .limit(k)
  }

  /** Temperature-flattened domain mixing (the multilingual-sampling
    * standard: sample domain i with probability ∝ p_i^α, α < 1 boosting
    * low-resource domains): per-domain quotas from α = 0.5 over the
    * domains' `massCol` totals, kept docs chosen by the md5 priority.
    *
    * α is fixed at 0.5 deliberately: `sqrt` is correctly rounded in IEEE
    * 754 (identical in every engine), while `pow(x, α)` may differ in the
    * last ulp across libm implementations — so this parameterization
    * keeps the whole quota computation under the exactness gate. The
    * normalizer Σ√mass is folded over the DOMAIN-SORTED list (a fixed
    * fold order makes the double sum engine-exact; domain cardinality is
    * tiny by definition). Returns per-domain (mass, quota, n_docs,
    * n_kept).
    */
  def temperatureMixSqrt(df: DataFrame, domainCol: String, idCol: String,
      massCol: String, budget: Long): DataFrame = {
    val masses = df.groupBy(col(domainCol))
      .agg(sum(col(massCol)).cast("long").as("mass"))
    val z = masses.agg(
      aggregate(
        array_sort(collect_list(struct(col(domainCol).as("d"), sqrt(col("mass")).as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("z"))
    val quotas = masses.crossJoin(broadcast(z))
      .select(col(domainCol), col("mass"),
        floor(lit(budget.toDouble) * sqrt(col("mass")) / col("z")).cast("long").as("quota"))
    val pri = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(domainCol)).orderBy(pri.asc, col(idCol).asc)
    df.select(col(domainCol), col(idCol))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(domainCol))
      .groupBy(col(domainCol), col("mass"), col("quota"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("__rank") <= col("quota")).cast("long")).as("n_kept"))
  }

  /** Length-bucketed batch assignment: bucket = `min(len / bucketWidth,
    * maxBucket)` (fixed ranges — a narrow map), batch id = position within
    * the bucket's (len, id) order divided by `batchSize`. Returns per-batch
    * rollups with the padding waste the bucketing exists to minimize:
    * `waste = Σ(batch_max_len − len)` if every batch pads to its own max.
    */
  def lengthBuckets(df: DataFrame, lenCol: String, idCol: String,
      bucketWidth: Long, maxBucket: Int, batchSize: Int): DataFrame = {
    val bucket = least(floor(col(lenCol) / bucketWidth), lit(maxBucket.toLong))
      .cast("long").as("bucket")
    val w = Window.partitionBy(col("bucket")).orderBy(col(lenCol).asc, col(idCol).asc)
    df.select(col(idCol), col(lenCol), bucket)
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(lenCol)).cast("long").as("min_len"),
        max(col(lenCol)).cast("long").as("max_len"),
        (count(lit(1)) * max(col(lenCol)) - sum(col(lenCol))).cast("long").as("pad_waste"))
  }
}
