package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 graph/association wave: degree-ordered triangle counting over
  * the order→part co-occurrence graph, market-basket association rules,
  * χ² token–label feature selection, and HLL sketch set algebra
  * (union / inclusion–exclusion intersection). Each gate replays end to
  * end in DuckDB over the same parquet tables.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Triangle counting ([[graft.operators.Triangles]]) on the part
    * co-occurrence graph (edge = two parts sharing an order), restricted
    * to the deterministic node color `l_partkey % 4 == 0` — the
    * node-coloring estimator's sampled subgraph (count scales by 4³ for
    * the whole-graph estimate; the oracle pins the sampled counts
    * themselves, which is strictly stronger). Degree-ordered orientation
    * caps wedge fan-out at O(√m) per node; the oracle counts the same
    * triangles by the orientation-free a<b<c id-order join, so an
    * orientation bug (double count, missed hub wedge) breaks the hash.
    */
  def q149Triangles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = graft.operators.CoOccurrence.pairCounts(li, "l_orderkey", "l_partkey")
    graft.operators.Triangles.perNode(edges, "x", "y")
      .select(col("node").as("part_node"), col("triangles"))
  }

  val q149Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
      |  FROM lineitem WHERE l_partkey % 4 = 0),
      |e AS (SELECT a.i AS x, b.i AS y FROM li a
      |  JOIN li b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2),
      |t AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c FROM e e1
      |  JOIN e e2 ON e1.y = e2.x
      |  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
      |n AS (SELECT a AS node FROM t
      |  UNION ALL SELECT b FROM t
      |  UNION ALL SELECT c FROM t)
      |SELECT node AS part_node, count(*) AS triangles FROM n GROUP BY 1""".stripMargin

  /** Market-basket association rules ([[graft.operators.CoOccurrence]]):
    * part pairs co-ordered in ≥ 2 orders, with exact support/item counts
    * and micro-rounded confidence (both directions) and lift. The lift
    * denominator n·s/(cx·cy) is IEEE-double over exact longs in a fixed
    * operation order — bit-replayable in SQL.
    */
  def q152AssocRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.CoOccurrence.rules(
      Tables.lineitem(s, dir), "l_orderkey", "l_partkey", minSupport = 2L)

  val q152Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |ic AS (SELECT i, count(*) AS c FROM li GROUP BY 1),
      |nn AS (SELECT count(DISTINCT g) AS n FROM li),
      |pc AS (SELECT a.i AS x, b.i AS y, count(*) AS s FROM li a
      |  JOIN li b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2
      |  HAVING count(*) >= 2)
      |SELECT pc.x, pc.y, pc.s AS support, cx.c AS x_count, cy.c AS y_count,
      |  CAST(round(CAST(pc.s AS DOUBLE) / CAST(cx.c AS DOUBLE) * 1e6) AS BIGINT)
      |    AS conf_xy_micro,
      |  CAST(round(CAST(pc.s AS DOUBLE) / CAST(cy.c AS DOUBLE) * 1e6) AS BIGINT)
      |    AS conf_yx_micro,
      |  CAST(round(CAST(nn.n AS DOUBLE) * CAST(pc.s AS DOUBLE) /
      |    (CAST(cx.c AS DOUBLE) * CAST(cy.c AS DOUBLE)) * 1e6) AS BIGINT)
      |    AS lift_micro
      |FROM pc JOIN ic cx ON cx.i = pc.x JOIN ic cy ON cy.i = pc.y
      |CROSS JOIN nn""".stripMargin

  /** χ² token–label feature selection
    * ([[graft.text.FeatureSelection.chiSquareTokens]]): token presence vs
    * the `lang = 'en'` label over `documents`. Exact 2×2 contingency
    * counts per token are under the hash alongside the micro-rounded
    * statistic, so both the counting plumbing and the IEEE formula replay.
    */
  def q150Chi2Tokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("lab", col("lang") === "en")
    graft.text.FeatureSelection.chiSquareTokens(docs, "doc_id", "toks", "lab",
      minDocs = 5L)
  }

  val q150Sql: String =
    """WITH base AS (SELECT doc_id, lang = 'en' AS lab, text FROM documents),
      |pres AS (SELECT DISTINCT b.doc_id, b.lab, tok AS token
      |  FROM base b, unnest(string_split(b.text, ' ')) AS s(tok)),
      |tot AS (SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM base),
      |pt AS (SELECT token,
      |    CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS b
      |  FROM pres GROUP BY 1),
      |f AS (SELECT token, a, b, pos - a AS c, n - pos - b AS d, n
      |  FROM pt CROSS JOIN tot WHERE a + b >= 5 AND a + b < n),
      |g AS (SELECT token, a, b, c, d, n,
      |    CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |      - CAST(b AS DOUBLE) * CAST(c AS DOUBLE) AS adbc,
      |    CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
      |      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE) AS den
      |  FROM f)
      |SELECT token, a, b, c, d,
      |  CASE WHEN den = 0 THEN 0
      |    ELSE CAST(round(CAST(n AS DOUBLE) * adbc * adbc / den * 1e6) AS BIGINT)
      |  END AS chi2_micro
      |FROM g""".stripMargin

  /** HLL sketch set algebra ([[graft.operators.Hll.pairwiseSetEstimates]]):
    * per-event-type user sketches → every type pair's single-set, union
    * (merged registers), and inclusion–exclusion intersection estimates,
    * joined against the EXACT distinct-user intersection so the oracle
    * pins both the sketch replay and the ground truth it approximates.
    */
  def q151HllSetops(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Hll
    val ev = Tables.events(s, dir)
    val sketches = Hll.build(ev, Seq("event_type"), "user_id")
    val est = Hll.pairwiseSetEstimates(sketches, "event_type")
    val gu = ev.select(col("event_type").as("g"), col("user_id").as("u")).distinct()
    val exact = gu.as("x")
      .join(gu.as("y"), col("x.u") === col("y.u") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("ga"), col("y.g").as("gb"))
      .agg(count(lit(1)).as("exact_intersect"))
    est.join(exact, Seq("ga", "gb"), "left")
      .withColumn("exact_intersect", coalesce(col("exact_intersect"), lit(0L)))
  }

  val q151Sql: String =
    """WITH h AS (SELECT event_type AS grp, user_id,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      |  FROM events),
      |reg AS (SELECT grp, hv % 64 AS j,
      |    max(CASE WHEN (hv >> 6) = 0 THEN 55
      |        ELSE 55 - length(ltrim(bin(hv >> 6), '0')) END) AS rho
      |  FROM h GROUP BY 1, 2),
      |est1 AS (SELECT grp,
      |    CAST(sum(CAST(power(2, 55 - rho) AS BIGINT)) AS BIGINT)
      |      + (64 - count(*)) * CAST(power(2, 55) AS BIGINT) AS s,
      |    64 - count(*) AS v_zero
      |  FROM reg GROUP BY 1),
      |est1f AS (SELECT grp,
      |    CAST(round((CASE WHEN raw <= 160.0 AND v_zero > 0
      |        THEN 64 * ln(CAST(64 AS DOUBLE) / v_zero) ELSE raw END) * 1e6)
      |      AS BIGINT) AS est_micro
      |  FROM (SELECT grp, v_zero,
      |      CAST(0.709 AS DOUBLE) * 64 * 64 * power(2, 55) / s AS raw
      |    FROM est1)),
      |grps AS (SELECT DISTINCT grp FROM reg),
      |pairs AS (SELECT a.grp AS ga, b.grp AS gb FROM grps a
      |  JOIN grps b ON a.grp < b.grp),
      |mreg AS (SELECT p.ga, p.gb, r.j, max(r.rho) AS rho
      |  FROM pairs p JOIN reg r ON r.grp = p.ga OR r.grp = p.gb
      |  GROUP BY 1, 2, 3),
      |estu AS (SELECT ga, gb,
      |    CAST(sum(CAST(power(2, 55 - rho) AS BIGINT)) AS BIGINT)
      |      + (64 - count(*)) * CAST(power(2, 55) AS BIGINT) AS s,
      |    64 - count(*) AS v_zero
      |  FROM mreg GROUP BY 1, 2),
      |estuf AS (SELECT ga, gb,
      |    CAST(round((CASE WHEN raw <= 160.0 AND v_zero > 0
      |        THEN 64 * ln(CAST(64 AS DOUBLE) / v_zero) ELSE raw END) * 1e6)
      |      AS BIGINT) AS est_union_micro
      |  FROM (SELECT ga, gb, v_zero,
      |      CAST(0.709 AS DOUBLE) * 64 * 64 * power(2, 55) / s AS raw
      |    FROM estu)),
      |gu AS (SELECT DISTINCT event_type AS g, user_id AS u FROM events),
      |ex AS (SELECT x.g AS ga, y.g AS gb, count(*) AS exact_intersect
      |  FROM gu x JOIN gu y ON x.u = y.u AND x.g < y.g GROUP BY 1, 2)
      |SELECT p.ga, p.gb,
      |  ea.est_micro AS est_a_micro, eb.est_micro AS est_b_micro,
      |  u.est_union_micro,
      |  greatest(CAST(0 AS BIGINT),
      |    ea.est_micro + eb.est_micro - u.est_union_micro)
      |    AS est_intersect_micro,
      |  coalesce(ex.exact_intersect, 0) AS exact_intersect
      |FROM pairs p
      |JOIN est1f ea ON ea.grp = p.ga
      |JOIN est1f eb ON eb.grp = p.gb
      |JOIN estuf u ON u.ga = p.ga AND u.gb = p.gb
      |LEFT JOIN ex ON ex.ga = p.ga AND ex.gb = p.gb""".stripMargin

  /** Fixed-round k-core peeling ([[graft.operators.KCore.peel]]) on the
    * same node-colored co-purchase graph as q149: 4 peel rounds at
    * k = 20 (right under the graph's ~29 mean degree, so the peel does
    * real work — ~15% of nodes and ~19% of edges drop — while k = 25
    * would collapse the whole graph). The oracle unrolls the 4 rounds as
    * MATERIALIZED CTEs; surviving nodes AND their final-subgraph degrees
    * are both under the hash, so a missed cascade (a node whose degree
    * fell below k only after a neighbor was peeled) breaks it.
    */
  def q154KCore(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = graft.operators.CoOccurrence.pairCounts(li, "l_orderkey", "l_partkey")
    graft.operators.KCore.peel(edges, "x", "y", k = 20, rounds = 4)
      .select(col("n").as("part_node"), col("degree"))
  }

  val q154Sql: String =
    """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
      |  FROM lineitem WHERE l_partkey % 4 = 0),
      |e0 AS MATERIALIZED (SELECT a.i AS a, b.i AS b FROM li a
      |  JOIN li b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2),
      |d1 AS (SELECT n, count(*) AS d FROM
      |  (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
      |k1 AS MATERIALIZED (SELECT n FROM d1 WHERE d >= 20),
      |e1 AS MATERIALIZED (SELECT e.a, e.b FROM e0 e
      |  JOIN k1 x ON x.n = e.a JOIN k1 y ON y.n = e.b),
      |d2 AS (SELECT n, count(*) AS d FROM
      |  (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
      |k2 AS MATERIALIZED (SELECT n FROM d2 WHERE d >= 20),
      |e2 AS MATERIALIZED (SELECT e.a, e.b FROM e1 e
      |  JOIN k2 x ON x.n = e.a JOIN k2 y ON y.n = e.b),
      |d3 AS (SELECT n, count(*) AS d FROM
      |  (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
      |k3 AS MATERIALIZED (SELECT n FROM d3 WHERE d >= 20),
      |e3 AS MATERIALIZED (SELECT e.a, e.b FROM e2 e
      |  JOIN k3 x ON x.n = e.a JOIN k3 y ON y.n = e.b),
      |d4 AS (SELECT n, count(*) AS d FROM
      |  (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1),
      |k4 AS MATERIALIZED (SELECT n FROM d4 WHERE d >= 20),
      |e4 AS MATERIALIZED (SELECT e.a, e.b FROM e3 e
      |  JOIN k4 x ON x.n = e.a JOIN k4 y ON y.n = e.b)
      |SELECT n AS part_node, count(*) AS degree FROM
      |  (SELECT a AS n FROM e4 UNION ALL SELECT b FROM e4)
      |GROUP BY 1 HAVING count(*) >= 20""".stripMargin

  /** Prefix-filtered exact set-similarity self-join
    * ([[graft.operators.SetSimilarityJoin.selfJoin]], the All-Pairs /
    * PPJoin family): exact Jaccard ≥ 0.8 pairs over 3-shingle sets with
    * candidates generated ONLY from each document's rarest-shingle
    * prefix (p = n − ⌈τn⌉ + 1 under the global document-frequency
    * order) — the published fix for [[Dedup.allPairsJaccard]]'s Σ df²
    * cost. Corpus = documents + exact clones (doc_id % 10 == 3 re-enter
    * at id + 1e6). The oracle replays the ENTIRE pipeline — frequency
    * order, integer prefix arithmetic, length filter, exact-integer
    * verification — so a broken prefix bound (a missed qualifying pair)
    * or a leaked non-qualifying candidate breaks the hash.
    */
  def q158PrefixJaccard(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val clones = base.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    graft.operators.SetSimilarityJoin.selfJoin(
      base.unionByName(clones), "text", "doc_id",
      thresholdMicro = 800000L, shingleSize = 3)
  }

  val q158Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 3),
      |toks AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS t FROM docs),
      |sh AS MATERIALIZED (SELECT doc_id,
      |    unnest(list_distinct(CASE WHEN len(t) >= 3
      |      THEN list_transform(generate_series(1, len(t) - 2),
      |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
      |      ELSE [array_to_string(t, ' ')] END)) AS sh
      |  FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |dfreq AS (SELECT sh, count(*) AS dfc FROM sh GROUP BY 1),
      |ranked AS (SELECT s.doc_id, s.sh, z.n,
      |    row_number() OVER (PARTITION BY s.doc_id ORDER BY d.dfc, s.sh) AS rn
      |  FROM sh s JOIN dfreq d USING (sh) JOIN sizes z USING (doc_id)),
      |prefix AS MATERIALIZED (SELECT sh, doc_id, n FROM ranked
      |  WHERE rn <= n - (800000 * n + 999999) // 1000000 + 1),
      |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a,
      |    b.doc_id AS id_b, a.n AS n_a, b.n AS n_b
      |  FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  WHERE 800000 * greatest(a.n, b.n) <= 1000000 * least(a.n, b.n)),
      |inter AS (SELECT c.id_a, c.id_b, c.n_a, c.n_b, count(*) AS shared
      |  FROM cand c JOIN sh x ON x.doc_id = c.id_a
      |  JOIN sh y ON y.doc_id = c.id_b AND y.sh = x.sh
      |  GROUP BY 1, 2, 3, 4)
      |SELECT id_a, id_b, shared, n_a, n_b,
      |  CAST(round(CAST(shared AS DOUBLE)
      |    / CAST(n_a + n_b - shared AS DOUBLE) * 1e6) AS BIGINT)
      |    AS jaccard_micro
      |FROM inter WHERE shared * 1000000 >= 800000 * (n_a + n_b - shared)""".stripMargin

  /** Chain-shaped connected components — the adversarial fixture for
    * min-label propagation: consecutive doc_ids link into paths of
    * length 120 (diameter 119 ≫ [[graft.operators.Dedup.SwitchRounds]]
    * AND ≫ the old maxIter=50 ceiling, the exact case propagation
    * cannot finish), so [[graft.operators.Dedup.clusters]] must hand off
    * to the large-star/small-star contraction and still produce the
    * min-id label of every node. The oracle recomputes the closure with
    * a recursive CTE, so a contraction bug that splits or merges any
    * chain breaks the hash. The %-rule uses the WITHIN-COPY id
    * (doc_id % 1e8), the CLAUDE.md blowup invariant — chains never span
    * blowup copies and per-copy structure is identical.
    */
  def q192ChainClusters(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val pairs = ids
      .filter((col("doc_id") % 100000000L) % 120 =!= 119)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      .join(ids.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
    graft.operators.Dedup.clusters(pairs)
      .select(col("id"), col("cluster"))
  }

  val q192Sql: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE (a.doc_id % 100000000) % 120 <> 119),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
      |SELECT id, min(r) AS cluster FROM reach GROUP BY id""".stripMargin

  /** Hub-shaped connected components — the SKEW fixture for the
    * large-star/small-star contraction (q192 covers diameter, this covers
    * degree): every ~100-doc block hangs off ONE hub node (its block
    * base), so the contraction's symmetric groupBy/join carries a hot key
    * per block, plus short chains whose `doc_id+1` endpoints may connect
    * to their block ONLY through the chain edge. Labels must be each
    * block's base (the component minimum); the oracle recomputes them
    * from the block rule directly. [[graft.operators.Dedup
    * .clustersByContraction]] is called explicitly — this pins the
    * contraction path itself, not the auto-switch. The %-rules use the
    * WITHIN-COPY id (doc_id % 1e8, the CLAUDE.md blowup invariant) so
    * blocks never span blowup copies; the ScaleStress
    * `hub_contraction_roundsAsRows` leg measures the same shape at
    * 10⁴·f hub degree.
    */
  def q208HubClusters(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    val inCopy = col("doc_id") % 100000000L
    val hub = ids.select((col("doc_id") - inCopy % 100).as("id_a"),
      col("doc_id").as("id_b"))
    val chain = ids.filter(inCopy % 100 < 5)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
    graft.operators.Dedup.clustersByContraction(hub.unionByName(chain))
      .select(col("id"), col("cluster"))
  }

  val q208Sql: String =
    """WITH d AS (SELECT doc_id,
      |    doc_id - (doc_id % 100000000) % 100 AS b FROM documents),
      |nodes AS (
      |  SELECT b AS id, b FROM d
      |  UNION SELECT doc_id, b FROM d
      |  UNION SELECT doc_id + 1, b FROM d WHERE (doc_id % 100000000) % 100 < 5)
      |SELECT id, min(b) AS cluster FROM nodes GROUP BY id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q208_hub_clusters" -> (q208HubClusters _),
    "q192_chain_clusters" -> (q192ChainClusters _),
    "q158_prefix_jaccard" -> (q158PrefixJaccard _),
    "q149_triangles" -> (q149Triangles _),
    "q150_chi2_tokens" -> (q150Chi2Tokens _),
    "q151_hll_setops" -> (q151HllSetops _),
    "q152_assoc_rules" -> (q152AssocRules _),
    "q154_kcore" -> (q154KCore _))

  val oracleSql: Map[String, String] = Map(
    "q208_hub_clusters" -> q208Sql,
    "q192_chain_clusters" -> q192Sql,
    "q158_prefix_jaccard" -> q158Sql,
    "q149_triangles" -> q149Sql,
    "q150_chi2_tokens" -> q150Sql,
    "q151_hll_setops" -> q151Sql,
    "q152_assoc_rules" -> q152Sql,
    "q154_kcore" -> q154Sql)
}
