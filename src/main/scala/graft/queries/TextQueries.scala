package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextFunctions._
import graft.operators.{Dedup, Similarity}
import graft.multimodal.Multimodal

/** LLM-pipeline operators over the documents/embeddings fixtures: text
  * analysis, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  * similarity search, multimodal plumbing.
  *
  * Hash-randomized operators are brought under the DuckDB-oracle gate by
  * pinning engine-portable parameterizations: MinHash-LSH (q27) emits only
  * exact-verified pairs, so the exact all-pairs SQL is its oracle; SimHash
  * (q28) and hyperplane LSH (q30) use md5-derived token hashes /
  * integer-formula planes the oracle regenerates. The faster
  * engine-specific defaults (xxhash64, Random-seeded planes) remain the
  * production paths, verified in ScalaTest against the exact brute-force
  * operators.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val enStop = Seq("the", "a", "is", "of", "and")
  private val opsWords = Seq("join", "merge", "sort", "group", "agg")
  private val sizeWords = Seq("big", "small", "fast", "slow")

  /** T5/T6 — per-document text statistics: token count, char count, average
    * token length, punctuation ratio.
    */
  def q22TextStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        charCount(col("text")).cast("long").as("n_chars_computed"),
        avgTokenLength(col("text")).as("avg_tok_len"),
        punctRatio(col("text")).as("punct_ratio"))

  val q22Sql: String = {
    // SQL string literal: double the quotes in the contraction alternates;
    // backslashes pass through DuckDB '…' literals untouched
    val bpeSql = graft.text.TextFunctions.bpePiecePattern.replace("'", "''")
    s"""SELECT doc_id,
      |  len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '$bpeSql')) AS BIGINT) AS n_bpe_tokens,
      |  length(text) AS n_chars_computed,
      |  CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
      |    / len(string_split_regex(trim(lower(text)), '\\s+')) AS avg_tok_len,
      |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
      |FROM documents""".stripMargin
  }

  /** Quality scoring: length/punct/stopword composite in [0,1] — the
    * LLM-corpus quality-filter shape.
    */
  def q23QualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), qualityScore(col("text"), enStop).as("quality"))

  val q23Sql: String = {
    val stopList = enStop.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks,
       |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS pr
       |  FROM documents)
       |SELECT doc_id,
       |  least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
       |  (1.0 - least(pr * 5.0, 1.0)) * 0.3 +
       |  least((CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE) / len(toks)) * 4.0, 1.0) * 0.3
       |    AS quality
       |FROM t""".stripMargin
  }

  /** Language-ID scores (n-gram/stopword heuristic): per-language hit ratios
    * as columns (the argmax [[TextFunctions.langId]] is spec-tested; scores
    * are the oracle-checkable surface).
    */
  def q24LangScores(s: SparkSession, dir: String): DataFrame = {
    val dicts = Map(
      "en" -> enStop,
      "ops" -> opsWords,
      "size" -> sizeWords)
    Tables.documents(s, dir).select(
      col("doc_id"),
      wordRatio(col("text"), dicts("en")).as("en_score"),
      wordRatio(col("text"), dicts("ops")).as("ops_score"),
      wordRatio(col("text"), dicts("size")).as("size_score"))
  }

  val q24Sql: String = {
    def ratio(words: Seq[String], as: String) = {
      val l = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(toks, x -> x IN ($l))) AS DOUBLE) / len(toks) AS $as"
    }
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents)
       |SELECT doc_id, ${ratio(enStop, "en_score")}, ${ratio(opsWords, "ops_score")},
       |  ${ratio(sizeWords, "size_score")}
       |FROM t""".stripMargin
  }

  /** Exact + canonicalized dedup: content hash, bag-of-words hash, and the
    * keep-smallest-id flag per content group.
    */
  def q25DedupExact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("bow_hash"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        contentFingerprint(col("text")).as("content_hash"),
        bagOfWordsFingerprint(col("text")).as("bow_hash"))
      .withColumn("keep", (col("doc_id") === min(col("doc_id")).over(w)).cast("int"))
  }

  val q25Sql: String =
    """WITH h AS (SELECT doc_id, md5(text) AS content_hash,
      |  md5(array_to_string(list_sort(string_split_regex(trim(lower(text)), '\s+')), ' ')) AS bow_hash
      |  FROM documents)
      |SELECT doc_id, content_hash, bow_hash,
      |  CAST(doc_id = min(doc_id) OVER (PARTITION BY bow_hash) AS INT) AS keep
      |FROM h""".stripMargin

  /** N-gram Jaccard near-dup (exact): 3-word shingles, candidate pairs share
    * ≥1 shingle, Jaccard ≥ 0.2. The shingle equi-join IS the scale path —
    * no all-pairs product is ever materialized.
    */
  def q26NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.allPairsJaccard(Tables.documents(s, dir), "text", "doc_id",
        threshold = 0.2, shingleSize = 3)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  val q26Sql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
      |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))) AS shingle FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT id_a, id_b, shared*1.0/(sa.n + sb.n - shared) AS jaccard
      |FROM shared
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE shared*1.0/(sa.n + sb.n - shared) >= 0.2""".stripMargin

  /** MinHash+LSH near-dup. Oracle-checked against the EXACT all-pairs SQL
    * (q26's formula at this threshold): banding only selects candidates —
    * every emitted pair is exact-Jaccard verified, so the output equals the
    * exact result whenever banding recall is complete. On the gated corpus
    * the surviving pairs all have Jaccard ≥ 0.9 (measured), where the
    * 16-band/2-row miss probability is (1−j²)^16 ≤ 3e-12 — and xxhash64 is
    * deterministic, so the equality is reproducible, not probabilistic.
    * DedupSpec additionally asserts output ⊆ exact on adversarial fixtures.
    */
  def q27MinhashLsh(s: SparkSession, dir: String): DataFrame =
    // 8 bands × 4 rows (not 16×2): background pair similarity on this corpus
    // is ~0.02 while every true pair sits at J ≥ 0.88, so banding with a J⁴
    // collision curve keeps recall complete at the gated margin (verified
    // against the exact oracle at sf0.01 AND sf0.1) while cutting bucket
    // collisions — and with them the verify join — by orders of magnitude.
    // ASSUMPTION, not a universal default: this is only sound because the
    // similarity profile is bimodal. A corpus with pairs near the 0.2
    // threshold (e.g. J≈0.5: ~60% miss under J⁴) needs banding re-sized to
    // the threshold — DedupSpec's mid-similarity adversarial fixture pins
    // that parameterization (32×1 there) by asserting LSH == exact.
    Dedup.nearDuplicates(Tables.documents(s, dir), "text", "doc_id",
      threshold = 0.2, numHashes = 32, bands = 8)

  /** Incremental near-dup ([[Dedup.bandIndex]]/[[Dedup.probeIndex]]): 90%
    * of the corpus plays the INDEXED existing corpus, the doc_id%10==0
    * slice arrives as the new batch and probes the stored band buckets —
    * the corpus is never re-shingled (only candidate docs are point-looked
    * -up for exact verification). Same exact-verify + recall-complete
    * argument as q27 (identical 32-hash/8-band parameters), restricted to
    * pairs with ≥1 new-batch side, so the exact all-pairs SQL with that
    * constraint is the oracle.
    */
  def q93IncrementalNeardup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val index = Dedup.bandIndex(existing, "text", "doc_id",
      numHashes = 32, bands = 8, shingleSize = 3)
    Dedup.probeIndex(batch, index, existing, "text", "doc_id",
      threshold = 0.2, numHashes = 32, bands = 8, shingleSize = 3)
  }

  val q93Sql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
      |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))) AS shingle FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT id_a, id_b, shared*1.0/(sa.n + sb.n - shared) AS jaccard
      |FROM shared
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE shared*1.0/(sa.n + sb.n - shared) >= 0.2
      |  AND (id_a % 10 = 0 OR id_b % 10 = 0)""".stripMargin

  /** SimHash near-dup via 4×8-bit banding over a 32-bit engine-portable
    * fingerprint (md5-derived token hash), so the DuckDB oracle replays the
    * whole computation: token hash → 32 signed bit-sums → sign-bit
    * fingerprint → band buckets → Hamming ≤ 1 (tighter than the 64-bit
    * default's ≤ 3: at half the width, distance thresholds halve to keep
    * the same selectivity). The 64-bit xxhash64 default
    * of [[Dedup.simhash]] stays the production fast path (spec-tested);
    * this query pins the portable variant under the hash gate.
    */
  def q28Simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDuplicates(Tables.documents(s, dir), "text", "doc_id",
      maxDistance = 1,
      tokenHash = graft.text.TextFunctions.portableTokenHash, bits = 32)

  val q28Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |             FROM documents),
      |h AS (SELECT doc_id, CAST(md5_number_upper(tok) % 4294967296 AS BIGINT) AS h FROM toks),
      |bitsums AS (SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |            FROM h CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i)
      |            GROUP BY 1, 2),
      |fp AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS fp
      |       FROM bitsums GROUP BY 1),
      |banded AS (SELECT doc_id, fp, b, (fp >> (b * 8)) & 255 AS key
      |           FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)),
      |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |                 CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      |          FROM banded a JOIN banded b
      |            ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 1""".stripMargin

  /** Brute-force cosine top-10 for a query panel (vec_id % 100 == 0), the
    * exact ANN baseline. Rounded to 9dp to absorb engine summation-order
    * differences in the oracle compare.
    */
  def q29KnnCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    Similarity.bruteForceTopK(emb, queries, k = 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos_sim_r"), col("rank"))
  }

  val q29Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) /
      |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim_r, rank
      |FROM ranked WHERE rank <= 10""".stripMargin

  /** LSH-bucketed approximate ANN, oracle-checked end to end: the planes
    * come from [[Similarity.portablePlanes]] (integer formula → exact
    * power-of-two division, bit-identical doubles in any engine), so the
    * DuckDB oracle regenerates them and replays signatures, Hamming-1
    * probing, candidate union, and the exact re-score — the approximation
    * itself is under the hash, like q54's seeded IVF. The Random-seeded
    * plane default stays available; recall vs q29 asserted in
    * SimilaritySpec for both.
    */
  def q30KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    Similarity.lshTopK(emb, queries, k = 10, bits = 6, dims = 64,
        planesFor = Some(t => Similarity.portablePlanes(6, 64, t)))
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos_sim_r"), col("rank"))
  }

  val q30Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |planes AS (SELECT t, b, d,
      |    (((t*100003 + b*64 + d + 1) * 2654435761) % 4294967296) / 2147483648.0 - 1.0 AS c
      |  FROM (SELECT unnest(generate_series(0, 3)) AS t),
      |       (SELECT unnest(generate_series(0, 5)) AS b),
      |       (SELECT unnest(generate_series(0, 63)) AS d)),
      |pl AS (SELECT t, b, list(c ORDER BY d) AS pv FROM planes GROUP BY 1, 2),
      |sigs AS (SELECT e.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
      |             THEN 1 << p.b ELSE 0 END) AS BIGINT) AS sig
      |  FROM e CROSS JOIN pl p GROUP BY 1, 2),
      |probes AS (SELECT s.vec_id AS query_id, s.t, CAST(xor(s.sig, m.m) AS BIGINT) AS bucket
      |  FROM sigs s CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS m) m
      |  WHERE s.vec_id % 100 = 0),
      |cands AS (SELECT DISTINCT p.query_id, s.vec_id AS neighbor_id
      |  FROM probes p JOIN sigs s ON s.t = p.t AND s.sig = p.bucket
      |  WHERE s.vec_id <> p.query_id),
      |scored AS (SELECT c.query_id, c.neighbor_id,
      |    list_dot_product(eq.v, en.v) /
      |      (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(en.v, en.v))) AS cos_sim
      |  FROM cands c
      |  JOIN e eq ON eq.vec_id = c.query_id
      |  JOIN e en ON en.vec_id = c.neighbor_id),
      |ranked AS (SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim_r, rank
      |FROM ranked WHERE rank <= 10""".stripMargin

  /** IVF approximate ANN. Oracle-checked: centroids here are the seed
    * vectors picked by a SQL-expressible rule (vec_id % 100 == 50, cell id =
    * seed's vec_id, no Lloyd refinement), so cell assignment, nprobe
    * routing, and the exact re-score are all replicated in DuckDB and land
    * under the hash. The TRAINED path (ivfCentroids k-means, xxhash64
    * seeding) is engine-specific fp arithmetic — exercised and
    * recall-bounded in SimilaritySpec instead.
    */
  def q54KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    Similarity.ivfTopK(emb, queries, k = 10, nprobe = 4, centroids = Some(cents))
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos_sim_r"), col("rank"))
  }

  val q54Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id % 100 = 50),
      |assign AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT e.vec_id, e.v, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, c.cv) /
      |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM e, cents c)
      |  WHERE rn = 1),
      |qcells AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, c.cv) /
      |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM e, cents c WHERE e.vec_id % 100 = 0)
      |  WHERE rn <= 4),
      |scored AS (
      |  SELECT q.query_id, a.vec_id AS neighbor_id,
      |    list_dot_product(a.v, q.qv) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
      |  FROM assign a JOIN qcells q USING (cell)
      |  WHERE a.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim_r, rank
      |FROM ranked WHERE rank <= 10""".stripMargin

  /** Multimodal decode, real bytes end to end: each document is wrapped as
    * a REAL container — even ids a 24-bit BMP, odd ids a CRC-correct PNG
    * (both built with pure Column byte math,
    * [[Multimodal.syntheticBmp]]/[[syntheticPng]]) — and
    * [[Multimodal.decodeHeaders]] parses geometry back out of the bytes
    * with the [[graft.multimodal.ImageHeaders]] parser. The oracle replays
    * the encode formulas; any parser defect (endianness, offset, chunk
    * framing) would hash-mismatch. Feature extraction over payloads stays
    * spec-tested (MultimodalSpec); frame sampling is q75.
    */
  def q31Multimodal(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(1) + col("doc_id") % 64).cast("int")
    val h = (lit(1) + col("doc_id") % 48).cast("int")
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0,
          Multimodal.syntheticBmp(w, h, col("text").cast("binary")))
        .otherwise(Multimodal.syntheticPng(w, h, col("text").cast("binary")))
        .as("payload"))
    Multimodal.decodeHeaders(media)
  }

  val q31Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      |  CAST(1 + doc_id % 64 AS INT) AS width,
      |  CAST(1 + doc_id % 48 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 8 END AS INT) AS bit_depth,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 54 + len(text)
      |            ELSE 57 + len(text) END AS BIGINT) AS n_bytes
      |FROM documents""".stripMargin

  /** A10/T5 — word-category ratios (LM-dictionary style) + rolling
    * fingerprint per document.
    */
  def q32WordCategories(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        wordRatio(col("text"), opsWords).as("ops_ratio"),
        wordRatio(col("text"), sizeWords).as("size_ratio"),
        rollingFingerprint(col("text")).as("fingerprint"))

  val q32Sql: String = {
    val ops = opsWords.map(w => s"'$w'").mkString(", ")
    val size = sizeWords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(len(list_filter(toks, x -> x IN ($ops))) AS DOUBLE) / len(toks) AS ops_ratio,
       |  CAST(len(list_filter(toks, x -> x IN ($size))) AS DOUBLE) / len(toks) AS size_ratio,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(toks, x -> CAST(md5_number_upper(x) % 4294967296 AS BIGINT))),
       |    (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
       |FROM t""".stripMargin
  }

  /** Embedding-cosine near-dup, gated on the SCALE path: LSH-bucketed
    * candidates ([[Dedup.embeddingNearDuplicatesLsh]]) with
    * [[Similarity.portablePlanes]], so the DuckDB oracle regenerates the
    * planes, replays the signature/Hamming-≤1 candidate generation, and
    * exactly re-scores — the approximation itself is under the hash (same
    * technique as q30/q54). The O(n²) exact broadcast join
    * ([[Dedup.embeddingNearDuplicates]]) is demoted to the DedupSpec recall
    * verifier; a DedupSpec plan assertion pins this query to the bucketed
    * equi-join (no broadcast nested loop / cartesian product).
    */
  def q52EmbeddingDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDuplicatesLsh(Tables.embeddings(s, dir), threshold = 0.45,
        bits = 8, tables = 4, dims = 64,
        planesFor = Some(t => Similarity.portablePlanes(8, 64, t)))
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 9).as("cos_sim_r"))

  // Candidate rule replayed relationally: a pair collides iff some table's
  // signatures are within Hamming distance 1 (own bucket + single-bit
  // probes). bit_count returns TINYINT in DuckDB — cast before comparing.
  val q52Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |planes AS (SELECT t, b, d,
      |    (((t*100003 + b*64 + d + 1) * 2654435761) % 4294967296) / 2147483648.0 - 1.0 AS c
      |  FROM (SELECT unnest(generate_series(0, 3)) AS t),
      |       (SELECT unnest(generate_series(0, 7)) AS b),
      |       (SELECT unnest(generate_series(0, 63)) AS d)),
      |pl AS (SELECT t, b, list(c ORDER BY d) AS pv FROM planes GROUP BY 1, 2),
      |sigs AS (SELECT e.vec_id, p.t,
      |    CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
      |             THEN 1 << p.b ELSE 0 END) AS BIGINT) AS sig
      |  FROM e CROSS JOIN pl p GROUP BY 1, 2),
      |cands AS (SELECT DISTINCT s1.vec_id AS id_a, s2.vec_id AS id_b
      |  FROM sigs s1 JOIN sigs s2 ON s1.t = s2.t AND s1.vec_id < s2.vec_id
      |  WHERE CAST(bit_count(xor(s1.sig, s2.sig)) AS INT) <= 1),
      |scored AS (SELECT c.id_a, c.id_b,
      |    list_dot_product(ea.v, eb.v) /
      |      (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos_sim
      |  FROM cands c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b)
      |SELECT id_a, id_b, round(cos_sim, 9) AS cos_sim_r
      |FROM scored WHERE cos_sim >= 0.45""".stripMargin

  /** int8 embedding quantization ([[graft.operators.Quantization]]): per
    * vector, the max-abs scale, an int8-code checksum (proves bit-identical
    * quantization), and the reconstruction RMSE (9dp absorbs summation
    * order). The narrow-map arithmetic is IEEE-exact in both engines.
    */
  def q91EmbeddingQuantize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantization.report(Tables.embeddings(s, dir))

  val q91Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |   CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
      |        THEN list_max(list_transform(v, x -> abs(x))) ELSE 1.0 END AS scale FROM e)
      |SELECT vec_id, scale,
      |  CAST(list_sum(list_transform(v, x -> CAST(round(x*127.0/scale) AS BIGINT)))
      |    AS BIGINT) AS code_sum,
      |  round(sqrt(list_sum(list_transform(v,
      |      x -> (x - round(x*127.0/scale)*scale/127.0)
      |         * (x - round(x*127.0/scale)*scale/127.0))) / len(v)), 9) AS rmse_r
      |FROM s""".stripMargin

  val queries: Map[String, Q] = Map(
    "q91_embedding_quantize" -> (q91EmbeddingQuantize _),
    "q52_embedding_dedup" -> (q52EmbeddingDedup _),
    "q22_text_stats" -> (q22TextStats _),
    "q23_quality_score" -> (q23QualityScore _),
    "q24_lang_scores" -> (q24LangScores _),
    "q25_dedup_exact" -> (q25DedupExact _),
    "q26_ngram_jaccard" -> (q26NgramJaccard _),
    "q27_minhash_lsh" -> (q27MinhashLsh _),
    "q93_incremental_neardup" -> (q93IncrementalNeardup _),
    "q28_simhash" -> (q28Simhash _),
    "q29_knn_cosine" -> (q29KnnCosine _),
    "q30_knn_lsh" -> (q30KnnLsh _),
    "q31_multimodal" -> (q31Multimodal _),
    "q32_word_categories" -> (q32WordCategories _),
    "q54_knn_ivf" -> (q54KnnIvf _))

  val oracleSql: Map[String, String] = Map(
    "q91_embedding_quantize" -> q91Sql,
    "q52_embedding_dedup" -> q52Sql,
    "q22_text_stats" -> q22Sql,
    "q23_quality_score" -> q23Sql,
    "q24_lang_scores" -> q24Sql,
    "q25_dedup_exact" -> q25Sql,
    "q26_ngram_jaccard" -> q26Sql,
    "q27_minhash_lsh" -> q26Sql,
    "q93_incremental_neardup" -> q93Sql,
    "q28_simhash" -> q28Sql,
    "q29_knn_cosine" -> q29Sql,
    "q30_knn_lsh" -> q30Sql,
    "q31_multimodal" -> q31Sql,
    "q32_word_categories" -> q32Sql,
    "q54_knn_ivf" -> q54Sql)
}
