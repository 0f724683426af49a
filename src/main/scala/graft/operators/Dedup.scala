package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextFunctions

/** Corpus deduplication operators for LLM-scale pipelines: exact,
  * MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification.
  *
  * Scale design:
  *  - exact dedup is a hash-groupBy (one shuffle on the content hash);
  *  - MinHash signatures are computed in a single explode→groupBy pass
  *    (numHashes aggregates, map-side combined);
  *  - LSH banding turns all-pairs comparison into an equi-join on
  *    (band, band_signature) — the only pairs materialized are bucket
  *    collisions, which is what makes near-dup feasible at 100 TB;
  *  - candidate pairs are then VERIFIED with exact shingle-set Jaccard
  *    (a second equi-join on shingle), so LSH is a pure recall optimization
  *    and never changes semantics.
  */
object Dedup {

  /** Word shingles of size `k` as a distinct-set array column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** Exact dedup: keep the smallest `idCol` per identical content
    * (md5 of raw text). Returns input + (content_hash, keep) columns.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    df.withColumn("content_hash", TextFunctions.contentFingerprint(col(textCol)))
      .withColumn("keep", col(idCol) === min(col(idCol)).over(w))
  }

  /** (id, shingle) exploded pairs — the base relation for MinHash and for
    * exact Jaccard verification.
    */
  def shinglePairs(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("shingle"))

  /** (id, sh) pairs with the shingle collapsed to a 64-bit hash. All
    * set-similarity math downstream (Jaccard counts, MinHash) only needs
    * equality on shingles, so joining/aggregating on a fixed-width long
    * instead of a ~3-word string cuts shuffle bytes and compare cost by an
    * order of magnitude — the difference between an 8-byte and an ~30-byte
    * join key on the engine's biggest equi-join. Collision risk over a
    * 64-bit space is ~n²/2⁶⁵ (≈1e-10 at 1M distinct shingles) and only
    * perturbs a count by 1 when it happens.
    */
  def hashedShinglePairs(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    // Hash each k-token slice DIRECTLY (xxhash64 over the sub-array) instead
    // of materializing the joined shingle string first — one hash per shingle,
    // zero intermediate string allocation in the hottest map stage.
    val toks = TextFunctions.tokens(col(textCol))
    // Native fused k-gram hasher — bit-identical to the array_distinct/
    // transform/slice/xxhash64 composition (ShingleHashesSpec) at a
    // fraction of the allocation cost.
    val hashed = graft.expressions.ShingleHashes(toks, k)
    // Spread by id BEFORE the expensive transform: guards against
    // few-row-group scans serializing the shingle work, and pre-partitions
    // for the downstream groupBy("id") (signatures / set sizes) so that
    // aggregation reuses this exchange instead of shuffling the exploded
    // (much larger) relation.
    Parallelism.spreadBy(df, col(idCol))
      .select(col(idCol).as("id"), explode(hashed).as("sh"))
  }

  /** MinHash signatures: one row per document, `numHashes` min-hash columns
    * m0..m{n-1} where m_i = min over shingles of xxhash64(i, shingle).
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): DataFrame =
    minhashSignaturesFromPairs(hashedShinglePairs(df, textCol, idCol, shingleSize), numHashes)

  /** Signature computation over a pre-built (id, shingle) relation — the
    * single home of the hash formula, shared by [[minhashSignatures]] and
    * [[nearDuplicates]] (which reuses its materialized pairs).
    */
  def minhashSignaturesFromPairs(pairs: DataFrame, numHashes: Int = 32): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"m$i"))
    pairs.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded signatures (id, band, sig): the bucket relation LSH joins on —
    * and, written to the lake, the INDEX an incremental pipeline probes
    * ([[bandIndex]]/[[probeIndex]]).
    */
  def bandSignatures(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandSigs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    signatures
      .select(col("id"), explode(array(bandSigs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), bucket-join on (band, band signature), emit distinct
    * (id_a < id_b) pairs that collide in ≥1 band.
    */
  def lshCandidatePairs(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = bandSignatures(signatures, bands, rowsPerBand)
    val a = banded.select(col("band"), col("sig"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("sig"), col("id").as("id_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact shingle-set Jaccard for given candidate pairs (columns id_a,id_b):
    * |A∩B| via equi-join on hashed shingle, |A∪B| = |A|+|B|−|A∩B|.
    * `pairs` is the (id, sh) relation from [[hashedShinglePairs]]. The
    * candidate and size relations are corpus-sized at the limit, so no
    * broadcast is forced — AQE converts these joins to broadcast at runtime
    * whenever the built side is actually small.
    */
  def jaccardVerify(candidates: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = pairs.groupBy(col("id")).agg(count_distinct(col("sh")).as("n"))
    val a = pairs.select(col("id").as("id_a"), col("sh"))
    val b = pairs.select(col("id").as("id_b"), col("sh"))
    val shared = a
      .join(candidates, Seq("id_a"))
      .join(b, Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs Jaccard over pairs sharing ≥1 shingle, in ONE shingle
    * equi-join + aggregate (no candidate materialization / re-join): the
    * exact-baseline counterpart to [[nearDuplicates]]. Cost is Σ_shingle
    * df(s)² — use the LSH path when shingle document-frequencies are heavy.
    */
  def allPairsJaccard(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    // three consumers (sizes + both join sides) — materialize once so
    // tokenization and the explode run once, not three times; blocks are
    // ContextCleaner-reclaimed when the result goes out of scope
    val pairs = Materialize.once(
      hashedShinglePairs(df, textCol, idCol, shingleSize))
    // shingles() already emits distinct shingles per doc → plain count
    val sizes = pairs.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = pairs.select(col("sh"), col("id").as("id_a"))
    val b = pairs.select(col("sh"), col("id").as("id_b"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-duplicate detection: signatures → banded
    * candidates → exact Jaccard ≥ threshold.
    */
  def nearDuplicates(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, numHashes: Int = 32, bands: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Shared by the signature pass and the verification joins —
    // materialized once so tokenization/explode runs once; unlike persist,
    // the blocks are released (ContextCleaner) as soon as callers drop the
    // result, so many-corpora sessions don't accumulate pinned storage.
    val pairs = Materialize.once(
      hashedShinglePairs(df, textCol, idCol, shingleSize))
    val sigs = minhashSignaturesFromPairs(pairs, numHashes)
    val cands = lshCandidatePairs(sigs, bands, numHashes / bands)
    jaccardVerify(cands, pairs).filter(col("jaccard") >= threshold)
  }

  /** Build the band index of a corpus: (id, band, sig) rows, one shuffle.
    * Persist/write this once; daily batches probe it via [[probeIndex]]
    * without the corpus ever being re-shingled, re-hashed, or re-banded —
    * the incremental posture a 100 TB dedup pipeline actually runs
    * (index size = |corpus| × bands fixed-width rows).
    */
  def bandIndex(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 16, shingleSize: Int = 3): DataFrame =
    bandSignatures(
      minhashSignatures(df, textCol, idCol, numHashes, shingleSize),
      bands, numHashes / bands)

  /** Near-dup detection of a NEW batch against an indexed corpus: the batch
    * is hashed and banded; candidates = batch-vs-index bucket collisions ∪
    * batch-internal collisions; exact Jaccard verification re-shingles ONLY
    * the candidate corpus documents (a semi-join point lookup), never the
    * whole corpus. Same (numHashes, bands, shingleSize) as the index build
    * — band signatures must be comparable.
    *
    * Returns verified (id_a, id_b, jaccard) with jaccard ≥ threshold and at
    * least one side in the new batch.
    */
  def probeIndex(newBatch: DataFrame, index: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, threshold: Double = 0.7,
      numHashes: Int = 32, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // probeIndex is designed for REPEATED daily-batch invocation in one
    // long-lived session — each intermediate is materialized once and
    // released by the ContextCleaner when the call's results are consumed,
    // so batch N's blocks never survive into batch N+1.
    val newPairs = Materialize.once(
      hashedShinglePairs(newBatch, textCol, idCol, shingleSize))
    val newSigs = minhashSignaturesFromPairs(newPairs, numHashes)
    val newBanded = bandSignatures(newSigs, bands, numHashes / bands)
    val vsIndex = newBanded
      .join(index.withColumnRenamed("id", "id_old"), Seq("band", "sig"))
      .filter(col("id") =!= col("id_old"))
      .select(least(col("id"), col("id_old")).as("id_a"),
        greatest(col("id"), col("id_old")).as("id_b"))
    val within = lshCandidatePairs(newSigs, bands, numHashes / bands)
    // cands feeds BOTH the old-side doc lookup and the verify join, and its
    // subtree (bucket joins over the banded index) is the expensive part —
    // without materialization every downstream consumer re-runs the whole
    // hash/band/join pipeline (measured 100 s → 8 s at sf0.1, local[32]).
    val cands = Materialize.once(vsIndex.unionByName(within).distinct())
    // shingle only the candidate old-side documents
    val oldIds = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id"))).distinct()
      .join(newBatch.select(col(idCol).as("id")), Seq("id"), "left_anti")
    val oldDocs = corpus.join(oldIds.withColumnRenamed("id", idCol),
      Seq(idCol), "left_semi")
    val oldPairs = hashedShinglePairs(oldDocs, textCol, idCol, shingleSize)
    // verify reads the pair relation three times (set sizes + both join
    // sides) — materialize the union so the old-side point lookup runs once
    val verifyPairs = Materialize.once(newPairs.unionByName(oldPairs))
    jaccardVerify(cands, verifyPairs)
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs, exact: all pairs (id_a < id_b)
    * with cosine ≥ threshold via the native codegen'd kernel. The
    * broadcast self-join is the small-corpus baseline; at scale use
    * [[embeddingNearDuplicatesLsh]] (bucketed candidates, same verify).
    */
  def embeddingNearDuplicates(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos_sim", graft.expressions.CosineSimilarity(col("__va"), col("__vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** LSH-bucketed embedding near-dup: multi-table hyperplane signatures
    * bucket the corpus; only bucket collisions are exactly verified. Same
    * output contract as [[embeddingNearDuplicates]] minus LSH recall loss
    * (spec-measured). This is the scale path: the corpus is bucketed with a
    * narrow map, the pair space is one equi-join on (table, bucket), and the
    * exact cosine runs only on collisions — no broadcast and no n² product.
    *
    * `planesFor` swaps the seeded random hyperplanes for a deterministic
    * family (e.g. [[Similarity.portablePlanes]]) so an external engine can
    * regenerate the exact candidate set (q52's DuckDB oracle).
    */
  def embeddingNearDuplicatesLsh(emb: DataFrame, threshold: Double,
      bits: Int = 8, tables: Int = 4, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planesFor: Option[Int => Array[Array[Double]]] = None): DataFrame = {
    val pf: Int => Array[Array[Double]] =
      planesFor.getOrElse(t => Similarity.planes(bits, dims, seed = 42L + t))
    val sigs = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        Similarity.signatureFromPlanes(col(vecCol), pf(t), dims).as("sig"))
    }
    // Candidate generation moves KEYS ONLY (guide §8: decide with small
    // rows, move payloads once): the probe side is exploded (bits+1)× per
    // table, so carrying the vector through the bucket join shuffled the
    // corpus payload ~36× (measured 112 MB of shuffle on a 3 MB corpus —
    // the suite's largest exchange). Ids are 8 bytes; the vectors are
    // re-attached to the (collision-sized) candidate set afterwards.
    val bucketed = emb
      .withColumn("bk", explode(array(sigs: _*)))
      .select(col(idCol),
        col("bk.tbl").as("tbl"), col("bk.sig").as("bucket"))
    // one side also probes all Hamming-1 neighbor buckets (recall lift,
    // same trick as Similarity.lshTopK)
    val probeMasks = typedLit(0L +: (0 until bits).map(i => 1L << i))
    val a = bucketed
      .withColumn("bucket", explode(transform(probeMasks, m => col("bucket").bitwiseXOR(m))))
      .select(col("tbl"), col("bucket"), col(idCol).as("id_a"))
    val b = bucketed.select(col("tbl"), col("bucket"), col(idCol).as("id_b"))
    val cands = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    cands.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos_sim", graft.expressions.CosineSimilarity(col("__va"), col("__vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Connected components over an undirected pair relation (id_a, id_b):
    * iterative min-label propagation — each round joins labels across edges
    * and keeps the per-node minimum, converging to label = smallest id in
    * the component. Rounds = O(component diameter); near-dup clusters are
    * shallow (copies of a common source), so convergence is typically 2-3
    * rounds and `maxIter` only bounds pathological chains. Each round
    * shuffles the PAIR-derived vertex set, never the corpus; the loop is
    * driver-side control flow over distributed steps (the standard Spark CC
    * shape), with an early-exit convergence probe per round.
    *
    * Returns (id, cluster) where cluster = min id reachable (incl. self).
    *
    * The loop runs until the convergence probe reports a fixed point;
    * `maxIter` is a safety valve against pathological long chains (a
    * component of diameter > maxIter). Exiting unconverged would silently
    * split one component into several clusters — so propagation runs at
    * most `min(maxIter, SwitchRounds)` rounds and a graph still moving
    * then is handed to [[clustersByContraction]] (O(log diameter)), whose
    * own round bound applies from there — i.e. a caller-supplied
    * `maxIter > SwitchRounds` does not buy more propagation rounds, it is
    * superseded by the contraction handoff.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // Each round is MATERIALIZED (eager localCheckpoint): labels round N is
    // a plan LEAF, so round N+1 plans a constant-size DAG instead of
    // re-optimizing N nested join layers — at 100× scale the replanning
    // cost of a growing lineage dominates long before the data does. The
    // previous round's blocks become unreachable when `labels` is rebound
    // and are reclaimed by the ContextCleaner (vs persist, which pins them
    // in the CacheManager for the session's lifetime).
    val edges = Materialize.once(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var labels = Materialize.once(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id")))
    var i = 0
    var converged = false
    // propagation moves a label one hop per round, so rounds = component
    // diameter; near-dup clusters (copies of a common source) converge in
    // 2-3. A graph still moving after `SwitchRounds` is chain-shaped —
    // hand it to the diameter-halving star contraction instead of paying
    // O(diameter) more joins (or silently splitting components at maxIter)
    val switchAt = math.min(maxIter, SwitchRounds)
    while (i < switchAt && !converged) {
      val prev = labels
      // The previous label rides along as a second aggregate (prev holds
      // exactly one row per id, so max(__old) recovers it): the
      // convergence probe is then a join-free scan of the materialized
      // round instead of a (node)-keyed shuffle join per round.
      val next = Materialize.once(
        edges.join(labels, edges("dst") === labels("id"))
          .select(col("src").as("id"), col("cluster"),
            when(lit(false), col("cluster")).as("__old"))
          .unionByName(prev.select(col("id"), col("cluster"),
            col("cluster").as("__old")))
          .groupBy(col("id")).agg(min(col("cluster")).as("cluster"),
            max(col("__old")).as("__old")))
      converged = next.filter(col("cluster") =!= col("__old")).isEmpty
      labels = next.select(col("id"), col("cluster"))
      i += 1
    }
    if (!converged) {
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"clusters(): still propagating after $switchAt rounds — " +
          "long-chain component; switching to star contraction")
      // Contract the QUOTIENT graph — edges relabeled by the propagated
      // labels — instead of restarting from the raw pairs: the k finished
      // propagation rounds already collapsed every ≤k-hop neighborhood
      // onto its min id, so the contraction starts from a graph whose
      // diameter is ~diam/k, not diam (fewer O(log diameter) rounds over
      // a smaller relation). Correct because quotient node ids ARE the
      // min ids of their collapsed groups: the quotient component's min
      // equals the original component's min, and composing the two label
      // maps (id → propagated label → contracted cluster) is exactly the
      // component-min labeling [[clustersByContraction]] would produce
      // from the raw pairs.
      val lab1 = labels.select(col("id").as("src"), col("cluster").as("id_a"))
      val lab2 = labels.select(col("id").as("dst"), col("cluster").as("id_b"))
      val qEdges = edges.join(lab1, Seq("src")).join(lab2, Seq("dst"))
        .select(col("id_a"), col("id_b"))
      val qLabels = clustersByContraction(qEdges)
        .select(col("id").as("__qid"), col("cluster").as("__qc"))
      return Materialize.once(
        labels.join(qLabels, labels("cluster") === col("__qid"))
          .select(col("id"), col("__qc").as("cluster")))
    }
    labels
  }

  /** Propagation rounds before [[clusters]] hands a graph that is still
    * moving to [[clustersByContraction]] (via the quotient-graph handoff
    * above — the propagation rounds are reused, not discarded). Shallow
    * near-dup graphs (copies of a common source) converge in 2-3 rounds;
    * a graph still moving after 4 is deep enough that the O(log diameter)
    * contraction wins over more O(diameter) propagation. */
  val SwitchRounds: Int = 4

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — the O(log diameter) counterpart of min-label
    * propagation's O(diameter): each round every node rewires its
    * neighborhood onto its neighborhood minimum (large-star re-parents
    * the strictly-larger neighbors, small-star the smaller ones), which
    * at least halves component diameter per alternation while provably
    * preserving connectivity. A path of length 10⁶ — the crawl-snapshot
    * chain shape min-label propagation cannot finish — converges in
    * ~log₂ rounds. Same contract as [[clusters]]: (id, cluster) with
    * cluster = min id of the component, every endpoint of `pairs` labeled.
    */
  def clustersByContraction(pairs: DataFrame, maxRounds: Int = 40): DataFrame =
    contractionLabels(pairs, maxRounds)._1

  /** [[clustersByContraction]] plus the round count (scale telemetry). */
  private[graft] def contractionLabels(pairs: DataFrame,
      maxRounds: Int = 40): (DataFrame, Int) = {
    // canonical undirected edge set (lo < hi), self-loops dropped; each
    // round is a plan leaf (same Materialize discipline as clusters())
    var edges = Materialize.once(pairs
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct())
    var edgeCount = edges.count() // cached across rounds (see below)
    var rounds = 0
    var converged = edgeCount == 0L
    while (rounds < maxRounds && !converged) {
      // large-star: m(u) = min(u, min neighbor); every neighbor v > u
      // re-parents to m(u). One symmetric groupBy + one equi-join.
      val sym = edges.select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(edges.select(col("hi").as("u"), col("lo").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("m"))
      // NOT distinct'd: duplicates cannot change byHi's min() below, and
      // the round's final distinct absorbs them — de-duplicating here
      // would pay a third full-relation exchange per round for nothing.
      val ls = sym.filter(col("v") > col("u"))
        .join(mins, Seq("u"))
        .select(col("m").as("lo"), col("v").as("hi")) // m ≤ u < v
        .filter(col("lo") =!= col("hi"))
      // small-star on the result: each node (as `hi`) re-parents its
      // smaller neighbors — and itself — onto their minimum.
      val byHi = ls.groupBy(col("hi")).agg(min(col("lo")).as("__mn"))
      val joined = ls.join(byHi, Seq("hi"))
      val next = Materialize.once(
        joined.select(col("__mn").as("lo"), col("lo").as("hi"))
          .unionByName(joined.select(col("__mn").as("lo"), col("hi")))
          .filter(col("lo") =!= col("hi")).distinct())
      // fixed point = identical canonical edge sets (both are distinct).
      // The exact set-difference check is the expensive half — pay it
      // ONLY on rounds where the cardinality is already unchanged (most
      // contracting rounds change the count, so this is one cheap count
      // job per round instead of count + anti-join every round)
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edgeCount = nextCount
      edges = next
      rounds += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"clustersByContraction(): no fixed point in $maxRounds rounds — " +
          "labels may split a component; raise maxRounds")
    // converged state is a union of stars rooted at each component min:
    // label = min(self, neighbors)
    val symF = edges.select(col("lo").as("id"), col("hi").as("v"))
      .unionByName(edges.select(col("hi").as("id"), col("lo").as("v")))
    val starLabels = symF.groupBy(col("id"))
      .agg(min(col("v")).as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("cluster"))
    // contract parity with clusters(): an endpoint appearing ONLY as a
    // self-pair (x, x) has no edge surviving the lo =!= hi filter above,
    // so the star labels miss it — re-attach every endpoint of `pairs`
    // with label = own id as the fallback (same cardinality as the
    // symmetric edge set; one extra pair-derived join, never the corpus).
    // Materialized like clusters(): callers get a plan LEAF, not a
    // lineage over the whole contraction history.
    val allIds = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct()
    val labels = Materialize.once(
      allIds.join(starLabels, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster")))
    (labels, rounds)
  }

  /** Keep-one-per-cluster exact-Jaccard dedup: pairs at `threshold` →
    * connected components → canonical = min doc id of the cluster; isolated
    * docs keep themselves. Returns (id, cluster, keep).
    */
  def deduplicateByJaccard(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    val pairs = allPairsJaccard(df, textCol, idCol, threshold, shingleSize)
    val labeled = clusters(pairs)
    df.select(col(idCol).as("id"))
      .join(labeled, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("id")))
      .withColumn("keep", (col("id") === col("cluster")).cast("int"))
  }

  /** SimHash: per token, a `bits`-wide hash; bit i of the fingerprint is
    * the sign of Σ_tokens (±1 by token-hash bit i). Computed as `bits`
    * conditional aggregates in ONE pass (no per-bit explosion), assembled
    * with bitwise OR (no arithmetic overflow).
    *
    * `tokenHash` defaults to xxhash64 (fastest; engine-specific). Pass
    * [[graft.text.TextFunctions.portableTokenHash]] with `bits = 32` for an
    * engine-portable fingerprint a SQL oracle can replay
    * (`md5_number_upper(tok) % 2^32` in DuckDB).
    */
  def simhash(df: DataFrame, textCol: String, idCol: String,
      tokenHash: Column => Column = xxhash64(_), bits: Int = 64): DataFrame = {
    require(bits > 0 && bits <= 64, "simhash width must be 1..64")
    val toks = Parallelism.spreadBy(df, col(idCol))
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val bitSums = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val summed = toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map { i =>
      shiftleft(when(col(s"b$i") > 0, 1L).otherwise(0L), i)
    }.reduce(_ bitwiseOR _)
    summed.select(col("id"), fp.as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDistance. All-pairs by
    * default — callers should pre-bucket (e.g. by 16-bit prefix) at scale;
    * [[simhashNearDuplicates]] does exactly that.
    */
  def hammingPairs(fps: DataFrame, maxDistance: Int): DataFrame = {
    val a = fps.select(col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = fps.select(col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Banded SimHash near-dup: 4 bands of `bits`/4 — any pair within Hamming
    * distance 3 shares at least one exact band (pigeonhole), so the bucket
    * join loses nothing while avoiding the all-pairs cross join.
    */
  def simhashNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      maxDistance: Int = 3,
      tokenHash: Column => Column = xxhash64(_), bits: Int = 64): DataFrame = {
    require(maxDistance <= 3, "4-band banding guarantees recall only to distance 3")
    require(bits % 4 == 0, "bits must split into 4 bands")
    val bandBits = bits / 4
    val bandMask = (1L << bandBits) - 1
    val fps = simhash(df, textCol, idCol, tokenHash, bits)
    val banded = fps.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(bandMask).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
