package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 curation-depth queries: semantic dedup (SemDeDup), file-skipping
  * stats pruning, URL canonicalization, column profiling, and fixed-round
  * PageRank. Each gate replays end to end in DuckDB.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  private def rm(s: SparkSession, paths: String*): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    paths.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  private val staged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Stage a frame once per (name, dir) as a small multi-file parquet dir
    * for file-stream sources (the LakeQueries idiom).
    */
  private def stageOnce(df: => DataFrame, name: String, dir: String): String = {
    val src = s"/tmp/graft_stage_${name}_${math.abs(dir.hashCode)}"
    if (staged.add(src)) {
      try df.repartition(8).write.mode("overwrite").parquet(src)
      catch { case e: Throwable => staged.remove(src); throw e }
    }
    src
  }

  /** SemDeDup ([[graft.operators.SemDedup]]): the corpus is embeddings plus
    * planted clones (every vec_id % 10 == 3 re-enters as id + 1,000,000 with
    * the vector scaled by 1.5 — float-rounded exactly the same way by both
    * engines, cosine ≈ 1 with its base, far above tau = 0.9, while genuine
    * non-dup pairs sit below ~0.7). Cells come from the q54 seed rule
    * (vec_id % 100 == 50), so assignment, within-cell pairing, and the
    * keep-lowest-id verdict all replay in SQL. Every clone must be dropped
    * IF it lands in its base's cell — and with exact-scaled clones the
    * cosine-to-centroid chain is near-identical, so they do; a clone
    * surviving, or an extra drop, breaks the hash.
    */
  def q135SemDedup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val clones = base.filter(col("vec_id") % 10 === 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => (x.cast("double") * 1.5).cast("float"))
          .as("embedding"))
    val corpus = base.unionByName(clones)
    val cents = base.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    graft.operators.SemDedup.dedup(corpus, cents, tau = 0.9)
  }

  val q135Sql: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings),
      |aug AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    CAST(list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT)) AS DOUBLE[])
      |  FROM base WHERE vec_id % 10 = 3),
      |cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM base WHERE vec_id % 100 = 50),
      |assign AS (SELECT vec_id, v, cell FROM (
      |    SELECT a.vec_id, a.v, c.cell,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_dot_product(a.v, c.cv) /
      |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM aug a, cents c) WHERE rn = 1),
      |dup AS (
      |  SELECT b.vec_id, count(*) AS n_dup_lower
      |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9
      |  GROUP BY 1)
      |SELECT s.vec_id, s.cell, coalesce(d.n_dup_lower, 0) AS n_dup_lower,
      |  CAST(coalesce(d.n_dup_lower, 0) = 0 AS INT) AS kept
      |FROM assign s LEFT JOIN dup d USING (vec_id)""".stripMargin

  /** File-skipping stats pruning ([[graft.lake.FileStats]]): orders is
    * written range-clustered on o_orderdate into 8 files with a per-file
    * min/max manifest; a 12-month range query then reads ONLY the files
    * whose range intersects (the spec asserts the candidate set shrinks —
    * the boundary split is sample-dependent, so the file COUNT stays out of
    * the oracle). The gate is the result-invariance contract: pruned read ≡
    * unpruned filter, so an off-by-one in the intersection test (dropping a
    * boundary file) or a stats bug breaks the hash.
    */
  def q136FileSkipping(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q136_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    val orders = Tables.orders(s, dir)
    graft.lake.FileStats.writeWithStats(orders, s"$root/orders",
      "o_orderdate", numFiles = 8)
    val lo = lit("1995-06-01").cast("timestamp_ntz")
    val hi = lit("1996-05-31").cast("timestamp_ntz")
    graft.lake.FileStats.readRange(s, s"$root/orders", "o_orderdate", lo, hi)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
  }

  val q136Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
      |  min(o_orderdate) AS first_date,
      |  max(o_orderdate) AS last_date
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1995-06-01' AND TIMESTAMP '1996-05-31'
      |GROUP BY 1""".stripMargin

  /** Z-order file skipping ([[graft.lake.ZOrder]]): events are written
    * clustered on the MORTON interleave of (user_id, epoch-day) into 16
    * files with a per-file two-dimensional min/max box manifest; a
    * user-cohort × date-window rectangle then opens only the files whose
    * box intersects (the spec asserts the candidate set shrinks AND that
    * the same rectangle prunes on BOTH axes — the 2-D win 1-D range
    * clustering can't give; file counts stay out of the oracle because
    * range boundaries are sample-dependent). The gate is q136's
    * result-invariance contract in two dimensions: pruned read ≡ unpruned
    * filter, so a box-intersection off-by-one or an interleave bug that
    * mis-places rows past their manifest box breaks the hash. (The Morton
    * code arithmetic itself is oracle-pinned by q69's mask-cascade
    * replay; this gate pins the LAYOUT + pruning read built on it.)
    */
  def q201ZorderSkipping(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q201_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    // u = user id (fits 16 bits at every SF), d = epoch day via integer
    // ns division (double division would lose ulps at 1e18 ns)
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("user_id").as("u"),
        expr("ts_ns div 86400000000000").as("d"))
    graft.lake.ZOrder.writeClustered(ev, s"$root/events_z", "u", "d",
      partitions = 16)
    graft.lake.ZOrder.readRectangle(s, s"$root/events_z", "u", "d",
        lit(40L), lit(80L), lit(19730L), lit(19736L)) // Jan 8–14 2024
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents_sum"),
        min(col("u")).as("u_min"), max(col("u")).as("u_max"),
        min(col("d")).as("d_min"), max(col("d")).as("d_max"))
  }

  val q201Sql: String =
    """WITH e AS (SELECT event_type, value, user_id AS u,
      |    epoch_ns(ts) // 86400000000000 AS d FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
      |  min(u) AS u_min, max(u) AS u_max, min(d) AS d_min, max(d) AS d_max
      |FROM e WHERE u BETWEEN 40 AND 80 AND d BETWEEN 19730 AND 19736
      |GROUP BY 1""".stripMargin

  /** Z-order clustering INSIDE the snapshot compactor
    * ([[graft.lake.Snapshots.compact]] `zOrder = true` ×
    * [[graft.lake.ZOrder.mortonCode]]): a fragmented versioned table is
    * compacted on the Morton interleave of (user, epoch-day), so the
    * rewritten files carry tight TWO-dimensional sidecar boxes; a
    * user-cohort × date-window rectangle over the post-compact version
    * ([[graft.lake.Snapshots.readVersionRect]]) then opens only the
    * intersecting files (SnapshotsSpec asserts the candidate set shrinks
    * on BOTH axes vs the 1-D compact — counts stay out of the oracle
    * because range boundaries are sample-dependent). This gate is q201's
    * result-invariance contract moved onto the VERSIONED lake: pruned
    * rectangle read ≡ unpruned filter, after a compact, under time
    * travel.
    */
  def q220ZorderCompact(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q220_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("user_id").as("u"),
        expr("ts_ns div 86400000000000").as("d"))
    // two commits → a fragmented pre-compact history (compaction's input)
    graft.lake.Snapshots.commit(
      ev.filter(col("u") % 2 === 0).repartitionByRange(8, col("d")),
      root, "ev", Seq.empty, statsCols = Seq("u", "d"))
    graft.lake.Snapshots.append(
      ev.filter(col("u") % 2 === 1).repartitionByRange(8, col("d")),
      root, "ev", Seq.empty, statsCols = Seq("u", "d"))
    val v = graft.lake.Snapshots.compact(s, root, "ev", Seq.empty,
      numFiles = 16, clusterCols = Seq("u", "d"),
      statsCols = Seq("u", "d"), zOrder = true)
    graft.lake.Snapshots.readVersionRect(s, root, "ev", v, Seq(
        ("u", lit(40L), lit(80L)),
        ("d", lit(19730L), lit(19736L)))) // Jan 8–14 2024
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents_sum"),
        min(col("u")).as("u_min"), max(col("u")).as("u_max"),
        min(col("d")).as("d_min"), max(col("d")).as("d_max"))
  }

  // same rectangle recompute as q201 — the layout must never change results
  val q220Sql: String = q201Sql

  /** URL canonicalization ([[graft.text.UrlNormalize]]): three synthetic
    * URL shapes per document (mixed-case scheme/host, default and
    * non-default ports, tracking params, fragments, trailing slashes), and
    * the oracle emits the EXPECTED canonical form straight from the
    * generating formula (the q31 formula-replay pattern) — any parser
    * defect (case rule, port rule, param filter/sort, slash strip) breaks
    * the hash on 500 rows.
    */
  def q137UrlCanonical(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val url = when(col("doc_id") % 3 === 0,
      concat(lit("HTTPS://WWW.Example"), (col("doc_id") % 7).cast("string"),
        lit(".COM:443/Path/"), col("doc_id").cast("string"),
        lit("/?utm_source=feed&b="), col("lang"), lit("&a=1#frag")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("http://News.Site"), (col("doc_id") % 5).cast("string"),
          lit(".org:80/a/b?z=9&utm_campaign=x&y=2&fbclid=abc")))
      .otherwise(concat(lit("https://cdn.host"), (col("doc_id") % 4).cast("string"),
        lit(".net:8443/file/"), col("doc_id").cast("string")))
    d.select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        graft.text.UrlNormalize.canonicalUrl(col("url")).as("canonical"),
        graft.text.UrlNormalize.host(col("url")).as("host"))
  }

  val q137Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |      'https://www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com/Path/'
      |        || CAST(doc_id AS VARCHAR) || '?a=1&b=' || lang
      |    WHEN doc_id % 3 = 1 THEN
      |      'http://news.site' || CAST(doc_id % 5 AS VARCHAR) || '.org/a/b?y=2&z=9'
      |    ELSE
      |      'https://cdn.host' || CAST(doc_id % 4 AS VARCHAR) || '.net:8443/file/'
      |        || CAST(doc_id AS VARCHAR) END AS canonical,
      |  CASE WHEN doc_id % 3 = 0 THEN 'www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      |    WHEN doc_id % 3 = 1 THEN 'news.site' || CAST(doc_id % 5 AS VARCHAR) || '.org'
      |    ELSE 'cdn.host' || CAST(doc_id % 4 AS VARCHAR) || '.net' END AS host
      |FROM documents""".stripMargin

  /** Column profiling ([[graft.operators.Profiling]]) over five orders
    * columns: exact ANALYZE semantics (null counts, exact distincts,
    * micro-scaled numeric extremes, string length stats) in one scan,
    * replayed column by column in SQL.
    */
  def q138Profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.profile(Tables.orders(s, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"))

  val q138Sql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |  min(CAST(round($c * 1e6) AS BIGINT)) AS min_micro,
         |  max(CAST(round($c * 1e6) AS BIGINT)) AS max_micro,
         |  CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len,
         |  CAST(NULL AS BIGINT) AS len_sum FROM orders""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS BIGINT) AS min_micro, CAST(NULL AS BIGINT) AS max_micro,
         |  CAST(min(len($c)) AS BIGINT) AS min_len,
         |  CAST(max(len($c)) AS BIGINT) AS max_len,
         |  CAST(sum(len($c)) AS BIGINT) AS len_sum FROM orders""".stripMargin
    Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
      num("o_totalprice"), str("o_orderpriority")).mkString("\nUNION ALL\n")
  }

  /** Fixed-round PageRank ([[graft.operators.PageRank]]) over the
    * undirected customer↔supplier trade graph (multi-edges kept as
    * weights). Micro-quantized ranks make all 3 rounds hash-exact — the
    * oracle unrolls them as CTEs, so a defect in out-degrees, the contrib
    * rounding, teleport, or the damping chain shifts rank_micro somewhere
    * in the graph.
    */
  def q139PageRank(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    graft.operators.PageRank.run(edges, "src", "dst", iters = 3)
  }

  val q139Sql: String = {
    def round(i: Int, prev: String): String =
      s"""c$i AS (SELECT e.dst AS node,
         |    CAST(sum(CAST(round(CAST(r.rm AS DOUBLE) / d.deg) AS BIGINT)) AS BIGINT) AS sc
         |  FROM e JOIN $prev r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY 1),
         |r$i AS (SELECT nodes.node,
         |    CAST(round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |        * CAST(1000000 AS DOUBLE) / nn.n) AS BIGINT)
         |    + CAST(round(CAST(coalesce(c.sc, 0) AS DOUBLE)
         |        * CAST(0.85 AS DOUBLE)) AS BIGINT) AS rm
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$i c ON nodes.node = c.node)""".stripMargin
    s"""WITH p AS (
       |  SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT cust AS src, supp AS dst FROM p
       |      UNION ALL SELECT supp, cust FROM p),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST(round(CAST(1000000 AS DOUBLE) / nn.n) AS BIGINT) AS rm
       |       FROM nodes CROSS JOIN nn),
       |${round(1, "r0")},
       |${round(2, "r1")},
       |${round(3, "r2")}
       |SELECT node, rm AS rank_micro FROM r3""".stripMargin
  }

  /** Portable HLL sketches ([[graft.operators.Hll]]): per-event-type
    * distinct-user sketches over events. The harmonic denominator is an
    * exact BIGINT (Σ 2^(55−M_j)) and the registers replay from the md5
    * formula, so the gate hash-covers the full sketch state (s, v_zero)
    * AND the micro-rounded estimate; exact distinct counts ride along as
    * the accuracy reference.
    */
  def q140HllDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val sk = graft.operators.Hll.build(ev, Seq("event_type"), "user_id")
    val ex = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sk.select(col("event_type"),
        graft.operators.Hll.harmonicS(col("registers")).as("s"),
        graft.operators.Hll.emptyRegisters(col("registers")).as("v_zero"),
        graft.operators.Hll.estimateMicro(col("registers")).as("est_micro"))
      .join(ex, "event_type")
  }

  val q140Sql: String =
    """WITH h AS (SELECT event_type AS grp, user_id,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      |  FROM events),
      |reg AS (SELECT grp, hv % 64 AS j,
      |    max(CASE WHEN (hv >> 6) = 0 THEN 55
      |        ELSE 55 - length(ltrim(bin(hv >> 6), '0')) END) AS rho
      |  FROM h GROUP BY 1, 2),
      |agg AS (SELECT grp,
      |    CAST(sum(CAST(power(2, 55 - rho) AS BIGINT)) AS BIGINT)
      |      + (64 - count(*)) * CAST(power(2, 55) AS BIGINT) AS s,
      |    64 - count(*) AS v_zero
      |  FROM reg GROUP BY 1),
      |est AS (SELECT grp, s, CAST(v_zero AS BIGINT) AS v_zero,
      |    CAST(0.709 AS DOUBLE) * 64 * 64 * power(2, 55) / s AS raw
      |  FROM agg),
      |fin AS (SELECT grp, s, v_zero,
      |    CAST(round((CASE WHEN raw <= 160.0 AND v_zero > 0
      |        THEN 64 * ln(CAST(64 AS DOUBLE) / v_zero) ELSE raw END) * 1e6)
      |      AS BIGINT) AS est_micro
      |  FROM est),
      |ex AS (SELECT event_type AS grp, count(DISTINCT user_id) AS exact_distinct
      |  FROM events GROUP BY 1)
      |SELECT f.grp AS event_type, f.s, f.v_zero, f.est_micro,
      |  CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
      |FROM fin f JOIN ex USING (grp)""".stripMargin

  /** Positional inverted index + phrase search
    * ([[graft.text.InvertedIndex]]): the corpus's most frequent trigram is
    * derived FROM the index (two 1:1 positional self-joins; count-desc,
    * lexicographic tiebreak; 1-row driver pick — dimension-sized) and then
    * phrase-searched through the posting lists. The oracle re-derives the
    * same phrase and recounts matches positionally, so index positions,
    * the phrase-join offsets, and the tiebreak are all under the hash at
    * any scale factor — no hardcoded phrase to go vacuous on a new
    * fixture.
    */
  def q141PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.text.InvertedIndex
    // six consumers (3 trigram legs + 3 posting-list filters) — compute the
    // explode once; the index relation is narrow token rows
    val idx = graft.operators.Materialize.once(
      InvertedIndex.build(Tables.documents(s, dir), "text", "doc_id"))
    val top = InvertedIndex.trigrams(idx)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc, col("w3").asc)
      .limit(1).collect().head // the phrase pick: one row, driver-sized
    val phrase = Seq(top.getString(0), top.getString(1), top.getString(2))
    InvertedIndex.phraseSearch(idx, phrase)
      .select(col("id"), lit(phrase(0)).as("w1"), lit(phrase(1)).as("w2"),
        lit(phrase(2)).as("w3"), col("n_matches"))
  }

  val q141Sql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
      |  FROM t WHERE len(t) >= 3),
      |tri AS (SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3, count(*) AS c
      |  FROM pos GROUP BY 1, 2, 3),
      |top AS (SELECT w1, w2, w3 FROM tri
      |  ORDER BY c DESC, w1 ASC, w2 ASC, w3 ASC LIMIT 1),
      |m AS (SELECT doc_id, count(*) AS n_matches
      |  FROM pos, top
      |  WHERE t[i] = w1 AND t[i+1] = w2 AND t[i+2] = w3
      |  GROUP BY 1)
      |SELECT m.doc_id AS id, top.w1, top.w2, top.w3, m.n_matches
      |FROM m CROSS JOIN top""".stripMargin

  /** One-pass Pearson correlation matrix ([[graft.operators.CorrMatrix]])
    * over four integer-scaled lineitem measures. Decimal(38,0) moments
    * match DuckDB's HUGEINT sums exactly; the oracle replays the identical
    * moment formula, corr rounded at 9dp (the q29 convention).
    */
  def q142CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    graft.operators.CorrMatrix.pearson(li, Seq(
      "quantity_c" -> round(col("l_quantity") * 100),
      "extprice_c" -> round(col("l_extendedprice") * 100),
      "discount_bp" -> round(col("l_discount") * 10000),
      "tax_bp" -> round(col("l_tax") * 10000)))
      .select(col("col_x"), col("col_y"), col("n"),
        round(col("corr"), 9).as("corr_r"))
  }

  val q142Sql: String = {
    val names = Seq("quantity_c", "extprice_c", "discount_bp", "tax_bp")
    def pair(x: String, y: String) =
      s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
         |  CASE WHEN CAST(n * ss_$x - s_$x * s_$x AS DOUBLE) > 0
         |        AND CAST(n * ss_$y - s_$y * s_$y AS DOUBLE) > 0 THEN
         |    round(CAST(n * sp_${x}__$y - s_$x * s_$y AS DOUBLE) /
         |      (sqrt(CAST(n * ss_$x - s_$x * s_$x AS DOUBLE)) *
         |       sqrt(CAST(n * ss_$y - s_$y * s_$y AS DOUBLE))), 9)
         |  END AS corr_r
         |FROM m""".stripMargin
    val ps = for { i <- names.indices; j <- names.indices if i < j }
      yield pair(names(i), names(j))
    s"""WITH b AS (SELECT
       |    CAST(round(l_quantity * 100) AS BIGINT) AS quantity_c,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS extprice_c,
       |    CAST(round(l_discount * 10000) AS BIGINT) AS discount_bp,
       |    CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
       |  FROM lineitem),
       |m AS (SELECT count(*) AS n,
       |  ${names.map(c => s"sum($c) AS s_$c, sum($c * $c) AS ss_$c").mkString(", ")},
       |  ${(for { i <- names.indices; j <- names.indices if i < j }
           yield s"sum(${names(i)} * ${names(j)}) AS sp_${names(i)}__${names(j)}")
           .mkString(", ")}
       |  FROM b)
       |${ps.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Histogram-sketch quantiles ([[graft.operators.Histogram]]): per-flag
    * equal-width histograms over extendedprice cents (64 bins × 2000$),
    * inverted at four quantiles. The bin → cumulative → interpolation
    * chain replays in SQL with every arithmetic step double-forced, so a
    * binning or inversion defect shifts an est_micro somewhere.
    */
  def q143HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val h = graft.operators.Histogram.build(li, Seq("g"), "cents",
      lo = 0L, binWidth = 200000L, bins = 64)
    graft.operators.Histogram.quantileMicro(h, Seq("g"),
      lo = 0L, binWidth = 200000L, qs = Seq(0.25, 0.5, 0.75, 0.99))
  }

  val q143Sql: String =
    """WITH b AS (SELECT l_returnflag AS g,
      |    least(greatest(CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      / CAST(200000 AS DOUBLE)) AS BIGINT), 0), 63) AS bin
      |  FROM lineitem),
      |h AS (SELECT g, bin, count(*) AS n FROM b GROUP BY 1, 2),
      |c AS (SELECT g, bin, n,
      |    sum(n) OVER (PARTITION BY g ORDER BY bin) AS cum,
      |    sum(n) OVER (PARTITION BY g ORDER BY bin) - n AS bef,
      |    sum(n) OVER (PARTITION BY g) AS total
      |  FROM h),
      |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |    CAST(0.75 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
      |hit AS (SELECT g, q, bin, n, bef, q * total AS t
      |  FROM c CROSS JOIN qs
      |  WHERE (cum >= q * total AND bef < q * total)
      |     OR (q * total <= 0 AND bef = 0))
      |SELECT g, q,
      |  CAST(round((CAST(0 AS DOUBLE) + CAST(200000 AS DOUBLE) *
      |    (bin + greatest((t - bef) / n, CAST(0 AS DOUBLE)))) * 1e6) AS BIGINT)
      |    AS est_micro
      |FROM hit""".stripMargin

  /** Reciprocal-rank fusion ([[graft.text.HybridSearch]]): two
    * deterministic top-20 retrieval lists over documents (token count and
    * distinct-token count, doc_id tiebreaks) fused with k = 60. The gate
    * pins the micro-exact contribution sums, list membership counting,
    * and the fused ranking's tiebreak; the input scorers are deliberately
    * simple — BM25 itself is gated at q65, this gates the FUSION.
    */
  def q144RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir).select(col("doc_id"),
      graft.text.TextFunctions.tokens(col("text")).as("t"))
    def topRanked(metric: org.apache.spark.sql.Column): DataFrame = {
      val top = toks.select(col("doc_id").as("id"), metric.as("m"))
        .orderBy(col("m").desc, col("id").asc).limit(20) // TakeOrdered top-k
      top.select(struct((-col("m")).as("nm"), col("id")).as("s"))
        .agg(array_sort(collect_list(col("s"))).as("arr")) // 20 rows
        .select(posexplode(col("arr")).as(Seq("pos", "s")))
        .select(col("s.id").as("id"), (col("pos") + 1).cast("long").as("rank"))
    }
    val byLen = topRanked(size(col("t")))
    val byDistinct = topRanked(size(array_distinct(col("t"))))
    graft.text.HybridSearch.rrf(Seq(byLen, byDistinct), "id", "rank", k = 60)
  }

  val q144Sql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |l1 AS (SELECT doc_id AS id,
      |    row_number() OVER (ORDER BY len(t) DESC, doc_id ASC) AS r
      |  FROM t QUALIFY r <= 20),
      |l2 AS (SELECT doc_id AS id,
      |    row_number() OVER (ORDER BY len(list_distinct(t)) DESC, doc_id ASC) AS r
      |  FROM t QUALIFY r <= 20),
      |c AS (SELECT id, CAST(round(1e6 / (60 + r)) AS BIGINT) AS c FROM l1
      |      UNION ALL
      |      SELECT id, CAST(round(1e6 / (60 + r)) AS BIGINT) AS c FROM l2),
      |f AS (SELECT id, CAST(sum(c) AS BIGINT) AS rrf_micro,
      |    count(*) AS n_lists FROM c GROUP BY 1)
      |SELECT id, rrf_micro, n_lists,
      |  row_number() OVER (ORDER BY rrf_micro DESC, id ASC) AS rank
      |FROM f""".stripMargin

  /** Streaming sketch maintenance: per-micro-batch HLL builds merged into
    * versioned parquet state (the q108 read-v{n}/write-v{n+1} pattern,
    * AvailableNow + checkpoint, maxFilesPerTrigger=2 forcing 4 real
    * micro-batches). The gate invariant is merge associativity end to
    * end: stream-folded state ≡ whole-corpus build, so the oracle is the
    * q140 replay. A MISSED file undershoots registers and breaks the
    * hash; re-delivery is absorbed by design (sketch union is idempotent
    * — the operational selling point of sketch state).
    */
  def q145StreamHll(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Hll
    val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    val src = stageOnce(ev, "hll_events", dir)
    val tag = math.abs(dir.hashCode)
    val stateRoot = s"/tmp/graft_q145_state_$tag"
    val ckpt = s"${graft.LocalScratch.dir()}/graft_q145_ckpt_$tag"
    rm(s, stateRoot, ckpt) // full-rebuild gate (I6 covers resume)
    Hll.build(ev.limit(0), Seq("event_type"), "user_id")
      .write.parquet(s"$stateRoot/v0")
    val zero = array_repeat(lit(0), 64)
    val q = graft.streaming.Incremental
      .fileStream(s, src, ev.schema, maxFilesPerTrigger = Some(2))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val st = s.read.parquet(s"$stateRoot/v$batchId")
        st.select(col("event_type"), col("registers").as("r_a"))
          .join(Hll.build(batch, Seq("event_type"), "user_id")
            .select(col("event_type"), col("registers").as("r_b")),
            Seq("event_type"), "full_outer")
          .select(col("event_type"),
            Hll.merge(coalesce(col("r_a"), zero), coalesce(col("r_b"), zero))
              .as("registers"))
          .repartition(1).write.parquet(s"$stateRoot/v${batchId + 1}")
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(new org.apache.hadoop.fs.Path(stateRoot))
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .map(_.drop(1).toInt).max
    s.read.parquet(s"$stateRoot/v$latest")
      .select(col("event_type"),
        Hll.harmonicS(col("registers")).as("s"),
        Hll.emptyRegisters(col("registers")).as("v_zero"),
        Hll.estimateMicro(col("registers")).as("est_micro"))
  }

  val q145Sql: String =
    """WITH h AS (SELECT event_type AS grp, user_id,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      |  FROM events),
      |reg AS (SELECT grp, hv % 64 AS j,
      |    max(CASE WHEN (hv >> 6) = 0 THEN 55
      |        ELSE 55 - length(ltrim(bin(hv >> 6), '0')) END) AS rho
      |  FROM h GROUP BY 1, 2),
      |agg AS (SELECT grp,
      |    CAST(sum(CAST(power(2, 55 - rho) AS BIGINT)) AS BIGINT)
      |      + (64 - count(*)) * CAST(power(2, 55) AS BIGINT) AS s,
      |    64 - count(*) AS v_zero
      |  FROM reg GROUP BY 1),
      |est AS (SELECT grp, s, CAST(v_zero AS BIGINT) AS v_zero,
      |    CAST(0.709 AS DOUBLE) * 64 * 64 * power(2, 55) / s AS raw
      |  FROM agg)
      |SELECT grp AS event_type, s, v_zero,
      |  CAST(round((CASE WHEN raw <= 160.0 AND v_zero > 0
      |      THEN 64 * ln(CAST(64 AS DOUBLE) / v_zero) ELSE raw END) * 1e6)
      |    AS BIGINT) AS est_micro
      |FROM est""".stripMargin

  /** Leakage-free group holdout ([[graft.operators.Assembly.groupHoldout]]):
    * documents split by SOURCE, so every source's docs land in exactly one
    * split. The (split, source) grid pins each source's assignment under
    * the hash; leakage-freeness is structural (split is a function of
    * source alone).
    */
  def q146GroupHoldout(s: SparkSession, dir: String): DataFrame =
    graft.operators.Assembly.groupHoldout(Tables.documents(s, dir), "source")
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"))

  val q146Sql: String =
    """SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'valid'
      |    ELSE 'test' END AS split, source, count(*) AS n_docs
      |FROM (SELECT source,
      |    CAST('0x' || substr(md5(source), 1, 8) AS BIGINT) % 1000 AS b
      |  FROM documents)
      |GROUP BY 1, 2""".stripMargin

  /** Deterministic weighted sampling
    * ([[graft.operators.Assembly.weightedSample]], A-ES keys): top-100
    * documents by ln(u)/n_chars — selection probability ∝ length, without
    * replacement, reproducible. The oracle regenerates u from the md5
    * formula and replays the nano-rounded key ordering.
    */
  def q147WeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Assembly.weightedSample(Tables.documents(s, dir),
      "doc_id", col("n_chars"), k = 100)

  val q147Sql: String =
    """SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
      |  CAST(round(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) + 1) / power(2, 60))
      |    / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
      |FROM documents
      |ORDER BY key_nano DESC, doc_id ASC
      |LIMIT 100""".stripMargin

  /** Per-group winsorization ([[graft.operators.Winsorize]]) of
    * extendedprice cents at p01/p99: the gate pins the interpolated
    * bounds (the q72 percentile parity), the strict-inequality clip
    * counts, and the EXACT milli-scaled sum of the clipped column.
    */
  def q148Winsorize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag").as("g"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    graft.operators.Winsorize.clip(li, Seq("g"), "cents", 0.01, 0.99)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents").cast("double") < col("lo_bound"), 1L)
          .otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("cents").cast("double") > col("hi_bound"), 1L)
          .otherwise(0L)).as("n_clipped_hi"),
        sum(col("clipped_milli")).as("clipped_milli_sum"))
  }

  val q148Sql: String =
    """WITH v AS (SELECT l_returnflag AS g,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
      |b AS (SELECT g, quantile_cont(c, 0.01) AS lo, quantile_cont(c, 0.99) AS hi
      |  FROM v GROUP BY 1),
      |cl AS (SELECT g, c, lo, hi,
      |    CAST(round(least(greatest(CAST(c AS DOUBLE), lo), hi) * 10) AS BIGINT)
      |      AS cm
      |  FROM v JOIN b USING (g))
      |SELECT g, count(*) AS n,
      |  CAST(sum(CASE WHEN CAST(c AS DOUBLE) < lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_lo,
      |  CAST(sum(CASE WHEN CAST(c AS DOUBLE) > hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_hi,
      |  CAST(sum(cm) AS BIGINT) AS clipped_milli_sum
      |FROM cl GROUP BY 1""".stripMargin

  /** Train-vs-eval decontamination at probe cost
    * ([[graft.operators.Decontamination]]): the eval suite (every 50th
    * document + its embedding) is indexed ONCE — distinct 8-shingle
    * hashes, cell-assigned vectors, centroids — then TWO training batches
    * probe the stored index; the eval corpus is never re-read. Training
    * ids ≡ 25 (mod 50) carry a 1.5-scaled clone of eval vector (id−25) —
    * a "paraphrase" sharing no n-gram, catchable only on the semantic
    * channel — and ids ≡ 10 (mod 50) append eval doc (id−10)'s text — a
    * verbatim leak catchable only on the n-gram channel. The plants land
    * in DIFFERENT probe batches (odd vs even), so each batch exercises a
    * live channel, and the oracle's ground truth proves neither channel
    * over- nor under-flags.
    */
  def q186ProbeDecontamination(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q186_idx_${math.abs(dir.hashCode)}"
    rm(s, root)
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    val evalEmb = emb.filter(col("vec_id") % 50 === 0)
    // q135's deterministic seed rule for the cell geometry
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    graft.operators.Decontamination.buildIndex(
      evalDocs, "text", "doc_id", k = 8, evalEmb, cents, root)

    // plant n-gram contamination: ids ≡ 10 (mod 50) append the verbatim
    // eval text (documents are too diverse for natural 8-gram overlap).
    // Materialized once: each probe consumes the planted corpus TWICE
    // (shingle input + verdict-join spine) × two batches — the scan+join+
    // concat synthesis sits above the last exchange and would re-run per
    // consumer (the W2.1 gram-synthesis lesson, not the ReusedExchange
    // anti-lesson)
    val evalTexts = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 10).as("doc_id"), col("text").as("eval_text"))
    val trainDocs = graft.operators.Materialize.once(
      docs.filter(col("doc_id") % 50 =!= 0)
        .join(evalTexts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("eval_text").isNotNull,
              concat(col("text"), lit(" "), col("eval_text")))
            .otherwise(col("text")).as("text")))
    // plant semantic-only contamination: ids ≡ 25 (mod 50) swap in the
    // scaled eval clone (float-rounded identically by both engines)
    val clones = emb.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 25).as("vec_id"),
        transform(col("embedding"), x => (x.cast("double") * 1.5).cast("float"))
          .as("clone_vec"))
    val trainEmb = emb.filter(col("vec_id") % 50 =!= 0)
      .join(clones, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("clone_vec"), col("embedding")).as("embedding"))

    // two batches, one index build: probes read ONLY the stored index
    def batch(parity: Int): DataFrame =
      graft.operators.Decontamination.probe(s,
          trainDocs.filter(col("doc_id") % 2 === parity), "text", "doc_id",
          k = 8, trainEmb.filter(col("vec_id") % 2 === parity), root,
          tau = 0.9)
        .withColumn("batch", lit(if (parity == 1) 1 else 2))
    batch(1).unionByName(batch(0))
  }

  val q186Sql: String =
    """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
      |clone AS (SELECT vec_id + 25 AS vec_id,
      |    list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT)) AS cv
      |  FROM emb WHERE vec_id % 50 = 0),
      |train_emb AS (
      |  SELECT e.vec_id, CAST(coalesce(c.cv, e.embedding) AS DOUBLE[]) AS v
      |  FROM emb e LEFT JOIN clone c USING (vec_id)
      |  WHERE e.vec_id % 50 <> 0),
      |eval_emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM emb WHERE vec_id % 50 = 0),
      |cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM emb WHERE vec_id % 100 = 50),
      |assign_eval AS (SELECT vec_id, v, cell FROM (
      |    SELECT a.vec_id, a.v, c.cell,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_dot_product(a.v, c.cv) /
      |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM eval_emb a, cents c) WHERE rn = 1),
      |assign_train AS (SELECT vec_id, v, cell FROM (
      |    SELECT a.vec_id, a.v, c.cell,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_dot_product(a.v, c.cv) /
      |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM train_emb a, cents c) WHERE rn = 1),
      |sem AS (SELECT t.vec_id, count(*) AS n_sem
      |  FROM assign_train t JOIN assign_eval e ON t.cell = e.cell
      |  WHERE list_dot_product(t.v, e.v) /
      |      (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(e.v, e.v))) >= 0.9
      |  GROUP BY 1),
      |train_docs AS (
      |  SELECT d.doc_id, CASE WHEN e.etext IS NOT NULL
      |      THEN d.text || ' ' || e.etext ELSE d.text END AS text
      |  FROM documents d LEFT JOIN (SELECT doc_id + 10 AS doc_id, text AS etext
      |      FROM documents WHERE doc_id % 50 = 0) e USING (doc_id)
      |  WHERE d.doc_id % 50 <> 0),
      |toks_e AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents WHERE doc_id % 50 = 0),
      |toks_t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM train_docs),
      |sh_e AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 8
      |    THEN list_distinct(list_transform(generate_series(1, len(t)-7),
      |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7])))
      |    ELSE [array_to_string(t, ' ')] END) AS sgl
      |  FROM toks_e),
      |sh_t AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 8
      |    THEN list_distinct(list_transform(generate_series(1, len(t)-7),
      |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7])))
      |    ELSE [array_to_string(t, ' ')] END) AS sgl
      |  FROM toks_t),
      |bench AS (SELECT DISTINCT sgl FROM sh_e),
      |ng AS (SELECT doc_id, count(*) AS n_overlap
      |  FROM sh_t JOIN bench USING (sgl) GROUP BY 1)
      |SELECT d.doc_id AS id,
      |  coalesce(ng.n_overlap, 0) AS n_overlap,
      |  CAST(coalesce(ng.n_overlap, 0) > 0 AS INT) AS ngram_hit,
      |  coalesce(sem.n_sem, 0) AS n_sem,
      |  CAST(coalesce(sem.n_sem, 0) > 0 AS INT) AS sem_hit,
      |  CAST(coalesce(ng.n_overlap, 0) > 0 OR coalesce(sem.n_sem, 0) > 0
      |    AS INT) AS contaminated,
      |  CAST(CASE WHEN d.doc_id % 2 = 1 THEN 1 ELSE 2 END AS INT) AS batch
      |FROM documents d
      |LEFT JOIN ng ON ng.doc_id = d.doc_id
      |LEFT JOIN sem ON sem.vec_id = d.doc_id
      |WHERE d.doc_id % 50 <> 0""".stripMargin

  /** STREAMING decontamination — the q186 probe shape as a Structured
    * Streaming job (foreachBatch): training documents arrive as a file
    * stream; every micro-batch probes the SAME stored eval index (built
    * once, before the stream starts) and appends its verdicts to a
    * parquet sink. Per-document verdicts are batch-independent, so the
    * sink's content is deterministic whatever the micro-batch boundaries
    * — the oracle is q186's ground truth minus the batch column. Proves
    * the index-probe posture composes with the streaming runtime
    * (checkpointed AvailableNow, I1/I4 machinery).
    */
  def q188StreamingDecontam(s: SparkSession, dir: String): DataFrame = {
    val h = math.abs(dir.hashCode)
    val idxRoot = s"/tmp/graft_q188_idx_$h"
    val sink = s"/tmp/graft_q188_sink_$h"
    val ckpt = s"${graft.LocalScratch.dir()}/graft_q188_ckpt_$h"
    rm(s, idxRoot, sink, ckpt)
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    // eval index: identical parameterization to q186
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    graft.operators.Decontamination.buildIndex(
      docs.filter(col("doc_id") % 50 === 0), "text", "doc_id", k = 8,
      emb.filter(col("vec_id") % 50 === 0), cents, idxRoot)
    // train side with q186's plants (text leak at ≡10, vector clone at ≡25)
    val evalTexts = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 10).as("doc_id"), col("text").as("eval_text"))
    val trainDocs = docs.filter(col("doc_id") % 50 =!= 0)
      .join(evalTexts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("eval_text").isNotNull,
            concat(col("text"), lit(" "), col("eval_text")))
          .otherwise(col("text")).as("text"))
    val clones = emb.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 25).as("vec_id"),
        transform(col("embedding"), x => (x.cast("double") * 1.5).cast("float"))
          .as("clone_vec"))
    val trainEmb = emb.filter(col("vec_id") % 50 =!= 0)
      .join(clones, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("clone_vec"), col("embedding")).as("embedding"))
    val src = stageOnce(trainDocs, "q188train", dir)
    val stream = graft.streaming.Incremental.fileStream(s, src,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    graft.streaming.Incremental.runForeachBatchToParquet(stream, sink, ckpt,
      (batch, _) => graft.operators.Decontamination.probe(
        batch.sparkSession, batch, "text", "doc_id", k = 8,
        trainEmb.join(batch.select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_semi"),
        idxRoot, tau = 0.9))
    s.read.parquet(sink)
  }

  /** q186's oracle without the batch column (the stream's union of
    * per-batch verdicts is batch-boundary-independent). */
  val q188Sql: String = {
    val base = q186Sql
    base.replace(
      """|  CAST(coalesce(ng.n_overlap, 0) > 0 OR coalesce(sem.n_sem, 0) > 0
      |    AS INT) AS contaminated,
      |  CAST(CASE WHEN d.doc_id % 2 = 1 THEN 1 ELSE 2 END AS INT) AS batch""".stripMargin,
      """|  CAST(coalesce(ng.n_overlap, 0) > 0 OR coalesce(sem.n_sem, 0) > 0
      |    AS INT) AS contaminated""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q188_streaming_decontam" -> (q188StreamingDecontam _),
    "q186_probe_decontamination" -> (q186ProbeDecontamination _),
    "q148_winsorize" -> (q148Winsorize _),
    "q147_weighted_sample" -> (q147WeightedSample _),
    "q146_group_holdout" -> (q146GroupHoldout _),
    "q145_stream_hll" -> (q145StreamHll _),
    "q144_rrf_fusion" -> (q144RrfFusion _),
    "q143_hist_quantiles" -> (q143HistQuantiles _),
    "q142_corr_matrix" -> (q142CorrMatrix _),
    "q141_phrase_search" -> (q141PhraseSearch _),
    "q140_hll_distinct" -> (q140HllDistinct _),
    "q135_semdedup" -> (q135SemDedup _),
    "q136_file_skipping" -> (q136FileSkipping _),
    "q201_zorder_skipping" -> (q201ZorderSkipping _),
    "q220_zorder_compact" -> (q220ZorderCompact _),
    "q137_url_canonical" -> (q137UrlCanonical _),
    "q138_profile" -> (q138Profile _),
    "q139_pagerank" -> (q139PageRank _))

  val oracleSql: Map[String, String] = Map(
    "q188_streaming_decontam" -> q188Sql,
    "q186_probe_decontamination" -> q186Sql,
    "q148_winsorize" -> q148Sql,
    "q147_weighted_sample" -> q147Sql,
    "q146_group_holdout" -> q146Sql,
    "q145_stream_hll" -> q145Sql,
    "q144_rrf_fusion" -> q144Sql,
    "q143_hist_quantiles" -> q143Sql,
    "q142_corr_matrix" -> q142Sql,
    "q141_phrase_search" -> q141Sql,
    "q140_hll_distinct" -> q140Sql,
    "q135_semdedup" -> q135Sql,
    "q136_file_skipping" -> q136Sql,
    "q201_zorder_skipping" -> q201Sql,
    "q220_zorder_compact" -> q220Sql,
    "q137_url_canonical" -> q137Sql,
    "q138_profile" -> q138Sql,
    "q139_pagerank" -> q139Sql)
}
