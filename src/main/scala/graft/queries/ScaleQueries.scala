package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ExactAgg
import graft.operators.SkewJoin

/** Scale-technique queries: each exercises a 100-TB-relevant execution
  * pattern whose RESULT is oracle-checkable because the technique is
  * result-invariant (salting, bucketing, bloom pre-filtering change the
  * plan, never the rows).
  *
  *  - q56: multi-level aggregation (rollup / grouping sets, SURVEY A11)
  *  - q57: skew-salted shuffle join ([[SkewJoin.saltedEquiJoin]])
  *  - q58: bucket-pruned co-located join (no shuffle on either join side)
  *  - q59: bloom-filter semi-join reduction (pre-shuffle row pruning)
  *  - q60: deterministic hash-based train/valid/test split (the
  *    training-data-pipeline primitive; md5-stable across engines/runs)
  *  - q61: rolling volatility + running max drawdown over a daily series
  *    (exact integer-cents window moments)
  */
object ScaleQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A11 — ROLLUP over (returnflag, linestatus) with grouping_id
    * disambiguating subtotal rows. Both engines use the same bitmask
    * convention (leftmost grouped column = most significant bit).
    */
  def q56GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        ExactAgg.fixedSum(col("l_quantity"), 2).as("sum_qty"),
        ExactAgg.fixedSum(col("l_extendedprice"), 2).as("sum_price"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n"), col("sum_qty"), col("sum_price"))

  val q56Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** Skew-salted join: lineitem (large, skewed toward hot orderkeys under a
    * pathological distribution) joined to orders through an 8-way salt.
    * The salt explodes the small side 8× and splits every hot key across 8
    * reducers; the aggregate proves rows are neither lost nor duplicated.
    */
  def q57SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ords = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    SkewJoin.saltedEquiJoin(li, ords, "l_orderkey", saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        ExactAgg.fixedSum(col("l_extendedprice"), 2).as("sum_price"))
  }

  val q57Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Targeted (hot-key-only) salting under GENUINE skew: one fifth of
    * lineitem is remapped onto a single join key, so the unsalted join
    * piles ~20% of the fact table on one reducer. `hotKeySaltedJoin`
    * detects the heavy hitter exactly, salts only its rows 8-way, and
    * replicates the right side for hot keys alone (≤ 8·hotKeys rows, vs
    * q57's full 8× replication). Oracle replays the remap + plain join —
    * the technique must be result-invariant.
    */
  def q134HotkeySalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      when(col("l_orderkey") % 5 === 0, lit(40L))
        .otherwise(col("l_orderkey")).as("jk"),
      col("l_extendedprice"))
    val ords = Tables.orders(s, dir)
      .select(col("o_orderkey").as("jk"), col("o_orderpriority"))
    SkewJoin.hotKeySaltedJoin(li, ords, "jk", saltFactor = 8, hotKeys = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        ExactAgg.fixedSum(col("l_extendedprice"), 2).as("sum_price"))
  }

  val q134Sql: String =
    """WITH li AS (SELECT CASE WHEN l_orderkey % 5 = 0 THEN 40
      |    ELSE l_orderkey END AS jk, l_extendedprice FROM lineitem)
      |SELECT o_orderpriority, count(*) AS n,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_price
      |FROM li JOIN orders ON jk = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Bucket-pruned co-located join: both sides written with
    * `bucketBy(8, custkey)` + in-bucket sort, then joined on the bucket
    * key — the sort-merge join reads each bucket pair directly with NO
    * shuffle on either side (the 100-TB pattern for repeated fact⋈dim joins
    * on a stable key; `ScaleOpsSpec` asserts the exchange-free plan).
    */
  def q58BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    graft.lake.Bucketing.writeBucketed(
      Tables.orders(s, dir), "graft_b_orders", "o_custkey", 8)
    graft.lake.Bucketing.writeBucketed(
      Tables.customer(s, dir), "graft_b_customer", "c_custkey", 8)
    s.table("graft_b_orders")
      .join(s.table("graft_b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        ExactAgg.fixedSum(col("o_totalprice"), 2).as("sum_total"))
  }

  val q58Sql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS sum_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Bloom-filter semi-join reduction: build a bloom filter over the keys of
    * a selective dimension subset (one nation's customers), drop non-matching
    * fact rows BEFORE the shuffle, then make the result exact with a
    * broadcast semi-join (the bloom admits false positives only, so
    * pre-filter + exact join ≡ exact join — that invariance is what the
    * oracle checks). At scale this is Spark's own runtime-filter pattern,
    * made explicit and tunable. The probe is the native codegen'd
    * [[graft.expressions.BloomProbe]] expression, not a ScalaUDF — the
    * pre-shuffle hot map stays inside whole-stage codegen (plan-asserted
    * in ScaleOpsSpec).
    */
  def q59BloomPrune(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir)
      .filter(col("c_nationkey") === 1)
      .select(col("c_custkey"))
    val bf = keys.stat.bloomFilter("c_custkey", expectedNumItems = 10000L, fpp = 0.01)
    Tables.orders(s, dir)
      .filter(graft.expressions.BloomProbe.mightContain(bf, col("o_custkey")))
      .join(broadcast(keys), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        ExactAgg.fixedSum(col("o_totalprice"), 2).as("sum_total"))
  }

  val q59Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS sum_total
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
      |GROUP BY 1""".stripMargin

  /** Deterministic train/valid/test split: bucket = first 8 hex chars of
    * md5(doc_id) mod 100 → 80/10/10. Hash-based (not random) so the split
    * is stable across engines, runs, partitionings, and corpus growth — the
    * property a training pipeline needs for reproducible dataset versions.
    */
  def q60HashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  val q60Sql: String =
    """WITH b AS (
      |  SELECT doc_id, n_chars,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM b GROUP BY 1""".stripMargin

  /** Rolling 7-row sample volatility and running max drawdown over the
    * per-(event_type, day) value series. All window moments accumulate as
    * integer cents (exact under any plan), and the float formula is applied
    * identically in both engines — so even sqrt chains hash-match.
    */
  def q61RollingVol(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s7", sum(col("cents")).over(w7).cast("double"))
      .withColumn("s27",
        sum(col("cents") * col("cents")).over(w7).cast("double"))
      .withColumn("vol7",
        when(col("n7") > 1,
          sqrt((col("s27") - col("s7") * col("s7") / col("n7")) /
            (col("n7") - 1)) / 100.0)
          .otherwise(0.0))
      .withColumn("cum", sum(col("cents")).over(wRun))
      .withColumn("runmax", max(col("cum")).over(wRun))
      .withColumn("drawdown", (col("runmax") - col("cum")) / lit(100.0))
      .select(col("event_type"), col("day"),
        (col("cents") / 100.0).as("day_value"),
        col("vol7"), col("drawdown"))
  }

  val q61Sql: String =
    """WITH daily AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |    sum(CAST(round(value*100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |w1 AS (
      |  SELECT event_type, day, cents,
      |    count(*) OVER w7 AS n7,
      |    CAST(sum(cents) OVER w7 AS DOUBLE) AS s7,
      |    CAST(sum(cents*cents) OVER w7 AS DOUBLE) AS s27,
      |    sum(cents) OVER wrun AS cum
      |  FROM daily
      |  WINDOW
      |    w7 AS (PARTITION BY event_type ORDER BY day
      |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |    wrun AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |w AS (
      |  SELECT *, max(cum) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
      |  FROM w1)
      |SELECT event_type, day, cents/100.0 AS day_value,
      |  CASE WHEN n7 > 1
      |    THEN sqrt((s27 - s7*s7/n7) / (n7 - 1)) / 100.0 ELSE 0.0 END AS vol7,
      |  (runmax - cum)/100.0 AS drawdown
      |FROM w""".stripMargin

  /** Optimizer-rule rewrite under the correctness gate: orders are staged
    * into a 50-shard sid-partitioned lake (shard = custkey mod 50, the
    * reference's `{sid}/...` layout at fixture scale), the symbol→sid map is
    * registered, and the [[graft.plans.SymbolPruningRule]] rewrites the
    * symbol-equality filter into `security_id IN (shard)` — so the scan
    * reads 1 of 50 partitions (spec-audited) while the RESULT stays exactly
    * the plain filter's rows, which is what the oracle checks.
    */
  private val sidLakeStaged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def q62SymbolPruning(s: SparkSession, dir: String): DataFrame = {
    val lake = s"/tmp/graft_sid_lake_${math.abs(dir.hashCode)}"
    // deterministic staging — write once per (JVM, sf dir); the query under
    // measurement is the pruned READ, not the lake build
    if (sidLakeStaged.add(lake)) {
      try Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate"), col("c_name").as("symbol"),
          (col("o_custkey") % 50).as("security_id"))
        .write.partitionBy("security_id").mode("overwrite").parquet(lake)
      catch { case e: Throwable => sidLakeStaged.remove(lake); throw e }
    }
    graft.plans.SymbolPruning.register(
      Tables.customer(s, dir)
        .select(col("c_name").as("symbol"),
          (col("c_custkey") % 50).as("security_id")),
      lakeRootPath = lake) // scoped: only scans under this lake are rewritten
    graft.plans.SymbolPruning.install(s)
    s.read.parquet(lake)
      .filter(col("symbol") === "Customer#000000042")
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        ExactAgg.fixedSum(col("o_totalprice"), 2).as("sum_total"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day"))
  }

  val q62Sql: String =
    """SELECT c_name AS symbol, count(*) AS n,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS sum_total,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
      |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_day
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_name = 'Customer#000000042'
      |GROUP BY 1""".stripMargin

  /** Sequence packing (training-pipeline primitive): documents in doc_id
    * order fill 2048-token packs through the distributed prefix sum; the
    * oracle replays the same exclusive-cumsum binning with a window cumsum.
    * Token counts use the engine's whitespace tokenizer (q22-parity SQL).
    */
  def q63SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val packed = graft.operators.Packing.packByBudget(
      docs, "n_tokens", Seq("doc_id"), budget = 2048L)
    graft.operators.Packing.packStats(packed, "n_tokens", budget = 2048L)
  }

  val q63Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, n_tokens,
      |    sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS excl
      |  FROM toks)
      |SELECT CAST(floor(excl / 2048) AS BIGINT) AS pack_id,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
      |  CAST(sum(n_tokens) AS DOUBLE) / 2048.0 AS fill_ratio
      |FROM cum GROUP BY 1""".stripMargin

  /** Corpus TF-IDF document profile ([[graft.text.TfIdf]]): the oracle
    * replays tokenize → tf → df → fixed-point idf → integer tf-idf sums,
    * including the (score desc, term asc) top-term tiebreak.
    */
  def q64TfIdf(s: SparkSession, dir: String): DataFrame =
    graft.text.TfIdf.documentProfile(Tables.documents(s, dir), "text", "doc_id")

  val q64Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, t.term, count(*) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                 x -> x <> '')) AS term
      |        FROM documents) t
      |  GROUP BY 1, 2),
      |idf AS (
      |  SELECT term, CAST(round(ln((SELECT count(*) FROM documents)
      |    / CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS idf_micro
      |  FROM terms GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, terms.term, tf * idf_micro AS tfidf_micro
      |  FROM terms JOIN idf USING (term)),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_terms,
      |    CAST(sum(tfidf_micro) AS BIGINT) AS sum_micro
      |  FROM scored GROUP BY 1),
      |top AS (
      |  SELECT doc_id, term AS top_term, tfidf_micro/1e6 AS top_score
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY tfidf_micro DESC, term ASC) AS rn FROM scored)
      |  WHERE rn = 1)
      |SELECT doc_id, n_terms, sum_micro/1e6 AS tfidf_sum, top_term, top_score
      |FROM agg JOIN top USING (doc_id)""".stripMargin

  /** BM25 top-20 retrieval for the query {hash, join, scan}
    * ([[graft.text.TfIdf.bm25]]); oracle replays the full scoring chain
    * including the micro-rounded idf and the (score desc, doc asc) ordering.
    */
  def q65Bm25(s: SparkSession, dir: String): DataFrame =
    graft.text.TfIdf.bm25(Tables.documents(s, dir), "text", "doc_id",
      queryTerms = Seq("hash", "join", "scan"))

  val q65Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, t.term, count(*) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                 x -> x <> '')) AS term
      |        FROM documents) t
      |  GROUP BY 1, 2),
      |idf AS (
      |  SELECT term, CAST(round(ln((SELECT count(*) FROM documents)
      |    / CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS idf_micro
      |  FROM terms GROUP BY 1),
      |dl AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        x -> x <> '')) AS dl
      |  FROM documents),
      |tot AS (SELECT CAST(sum(dl) AS DOUBLE) AS total_dl,
      |               CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
      |per AS (
      |  SELECT t.doc_id,
      |    CAST(round((idf_micro/1e6) *
      |      (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 +
      |        0.75 * dl / (total_dl / n_docs)))) * 1e6) AS BIGINT) AS score_micro
      |  FROM terms t JOIN idf USING (term) JOIN dl ON t.doc_id = dl.doc_id
      |  CROSS JOIN tot
      |  WHERE term IN ('hash', 'join', 'scan'))
      |SELECT doc_id, count(*) AS n_hit_terms,
      |  sum(score_micro)/1e6 AS bm25
      |FROM per GROUP BY 1
      |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Coverage/data-quality report ([[graft.lake.Validation.coverageReport]]):
    * per (user, month), weekday-spine days inside the user's active span vs
    * observed distinct event days. The reference computes this by crawling
    * object listings; here it's one broadcast spine join.
    */
  def q67CoverageReport(s: SparkSession, dir: String): DataFrame = {
    // distinct (user, day) is the shared base: bounds→spine, per-user
    // spans, and observed days all derive from it. MATERIALIZE it — plain
    // exchange reuse does not fire here (the optimizer rewrites each
    // consumer differently, e.g. collapsing min/max over the distinct into
    // aggs over the raw scan, so the subtrees stop being identical and the
    // fact table would be scanned once PER consumer). The cached set is
    // |users|×|days| rows — dimension-scale next to the fact table.
    val days = graft.operators.Materialize.once(
      Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct())
    val spine = graft.ticks.Calendar.weekdaySpineFromBounds(
      days.agg(min(col("day")).as("lo"), max(col("day")).as("hi")))
    graft.lake.Validation.coverageReport(days, "user_id", "day", spine)
      .select(col("user_id"), col("month"), col("expected_days"),
        col("observed_days"), col("missing_days"), col("coverage"))
  }

  val q67Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(
      |    (SELECT min(day) FROM days), (SELECT max(day) FROM days),
      |    INTERVAL 1 DAY)) AS DATE) AS date),
      |wd AS (SELECT date FROM spine WHERE extract(dow FROM date) BETWEEN 1 AND 5),
      |bounds AS (
      |  SELECT user_id, min(day) AS first_d, max(day) AS last_d
      |  FROM days GROUP BY 1),
      |expected AS (
      |  SELECT user_id, strftime(date, '%Y-%m') AS month,
      |    count(*) AS expected_days
      |  FROM bounds JOIN wd ON date BETWEEN first_d AND last_d
      |  GROUP BY 1, 2),
      |observed AS (
      |  SELECT user_id, strftime(day, '%Y-%m') AS month,
      |    count(*) AS observed_days
      |  FROM days WHERE day IN (SELECT date FROM wd)
      |  GROUP BY 1, 2)
      |SELECT e.user_id, e.month, e.expected_days,
      |  coalesce(o.observed_days, 0) AS observed_days,
      |  e.expected_days - coalesce(o.observed_days, 0) AS missing_days,
      |  CAST(coalesce(o.observed_days, 0) AS DOUBLE) / e.expected_days AS coverage
      |FROM expected e LEFT JOIN observed o
      |  ON e.user_id = o.user_id AND e.month = o.month""".stripMargin

  /** Incremental aggregate maintenance ([[graft.lake.IncrementalAgg]]):
    * pre-1997 orders are the stored rollup, 1997+ orders the daily delta;
    * the merged rollup must equal the full recompute — which is the oracle.
    */
  def q68IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val orders = Tables.orders(s, dir)
    val current = rollup(orders.filter(year(col("o_orderdate")) < 1997))
    val delta = rollup(orders.filter(year(col("o_orderdate")) >= 1997))
    graft.lake.IncrementalAgg.merge(current, delta,
        Seq("o_custkey"), Seq("n_orders", "cents"))
      .select(col("o_custkey"), col("n_orders"),
        (col("cents") / 100.0).as("total"))
  }

  val q68Sql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total
      |FROM orders GROUP BY 1""".stripMargin

  /** Z-order layout ([[graft.lake.ZOrder]]): Morton codes over
    * (custkey, order-day-number), bucketed by the code's high bits — the
    * rectangles a clustered write would map to row groups. The oracle
    * replays the identical mask-cascade bit interleave.
    */
  def q69ZOrder(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("dayno"))
    o.withColumn("z", graft.lake.ZOrder.mortonCode(col("o_custkey"), col("dayno")))
      .groupBy((col("z") / lit(1048576)).cast("long").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"),
        min(col("o_custkey")).as("ck_min"), max(col("o_custkey")).as("ck_max"),
        min(col("dayno")).cast("long").as("day_min"),
        max(col("dayno")).cast("long").as("day_max"))
  }

  private def spreadSql(e: String): String = {
    val clamped = s"(($e) & 65535)"
    Seq((8, "16711935"), (4, "252645135"), (2, "858993459"), (1, "1431655765"))
      .foldLeft(clamped) { case (x, (sh, m)) => s"((($x | ($x << $sh)) & $m))" }
  }

  val q69Sql: String = {
    val zx = spreadSql("o_custkey")
    val zy = spreadSql("dayno")
    s"""WITH o AS (
       |  SELECT o_custkey,
       |    datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS dayno
       |  FROM orders),
       |z AS (SELECT o_custkey, dayno, ($zx | ($zy << 1)) AS z FROM o)
       |SELECT CAST(floor(z / 1048576) AS BIGINT) AS z_bucket, count(*) AS n,
       |  min(z) AS z_min, max(z) AS z_max,
       |  min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
       |  CAST(min(dayno) AS BIGINT) AS day_min, CAST(max(dayno) AS BIGINT) AS day_max
       |FROM z GROUP BY 1""".stripMargin
  }

  /** Custom physical operator under the gate ([[graft.plans.TopKPerKey]]):
    * top-3 orders per customer by price without sorting any key group —
    * bounded heaps before AND after one hash shuffle. Oracle = the window
    * row_number formulation (identical rows, tiebreak on orderkey).
    */
  def q70TopkPerKey(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      k = 3, keyCols = Seq("o_custkey"),
      orderBys = Seq(("o_totalprice", false), ("o_orderkey", true)))

  val q70Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** Exact quantile family per group: Spark's `percentile` and DuckDB's
    * `quantile_cont` share the (n−1)·p linear-interpolation definition, and
    * interpolation over identical doubles is pure IEEE arithmetic — so even
    * p25/median/p75 chains hash-match (q34's median established this; here
    * the family is first-class).
    */
  def q72Quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("median"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))

  val q72Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.5) AS median,
      |  quantile_cont(o_totalprice, 0.75) AS p75,
      |  quantile_cont(o_totalprice, 0.99) AS p99
      |FROM orders GROUP BY 1""".stripMargin

  /** Unigram cross-entropy quality scoring ([[graft.text.Perplexity]]) —
    * the corpus-LM filter of a training-data pipeline, with the full
    * tokenize → model → score chain replayed by the oracle.
    */
  def q73Perplexity(s: SparkSession, dir: String): DataFrame =
    graft.text.Perplexity.unigramCrossEntropy(
      Tables.documents(s, dir), "text", "doc_id")

  val q73Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, t.t FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |             x -> x <> '')) AS t
      |    FROM documents) t),
      |counts AS (SELECT t, count(*) AS c FROM toks GROUP BY 1),
      |model AS (
      |  SELECT t, CAST(round(-ln(c / (SELECT CAST(sum(c) AS DOUBLE) FROM counts))
      |    * 1e6) AS BIGINT) AS nll_micro
      |  FROM counts)
      |SELECT doc_id, count(*) AS n_tokens,
      |  sum(nll_micro)/1e6 AS nll_sum,
      |  sum(nll_micro)/1e6/count(*) AS avg_nll
      |FROM toks JOIN model USING (t)
      |GROUP BY 1""".stripMargin

  /** Stratified sampling, gated on the hash-deterministic path
    * ([[graft.operators.Assembly.stratifiedSampleByHash]]): per-stratum
    * md5-threshold keep rule (20%/5% per event class), fully replayable in
    * any engine — same technique as q60's split. The seed-pinned
    * engine-RNG `sampleBy` variant stays available as
    * [[q74SampleBySeedPinned]] (the API users reach for), verified for
    * determinism + fraction tolerance in ScaleOpsSpec.
    */
  def q74StratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Assembly.stratifiedSampleByHash(
        Tables.events(s, dir), "event_type", "event_id", q74Fractions)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("user_id")).as("n_users"))

  private val q74Fractions = Map("click" -> 0.2, "view" -> 0.2,
    "purchase" -> 0.05, "signup" -> 0.05, "error" -> 0.05)

  val q74Sql: String =
    """WITH s AS (
      |  SELECT event_type, user_id,
      |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS h
      |  FROM events)
      |SELECT event_type, count(*) AS n_sampled,
      |  count(DISTINCT user_id) AS n_users
      |FROM s
      |WHERE (event_type IN ('click', 'view') AND h < 2000)
      |   OR (event_type IN ('purchase', 'signup', 'error') AND h < 500)
      |GROUP BY 1""".stripMargin

  /** Seed-pinned `sampleBy` (stratified Bernoulli via partition-sequential
    * RNG): deterministic for a fixed seed+plan but engine-specific, so it
    * is spec-verified (determinism, per-stratum fraction tolerance) rather
    * than oracle-gated.
    */
  def q74SampleBySeedPinned(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .stat.sampleBy("event_type", q74Fractions, seed = 42L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("user_id")).as("n_users"))

  /** Multimodal frame sampling under the gate: video-like payloads slice
    * into 4 equal byte ranges, one row per frame (the explode shape a real
    * frame sampler produces — decode itself stays stubbed per the container
    * constraint). The oracle replays the byte math on the UTF-8 source text
    * (fixture docs are ASCII, so char offsets == byte offsets).
    */
  def q75FrameSample(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.sampleFrames(
      graft.multimodal.Multimodal.fromDocuments(Tables.documents(s, dir)),
      frames = 4)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame_bytes")).cast("long").as("frame_len"),
        md5(col("frame_bytes")).as("frame_md5"))

  val q75Sql: String =
    """SELECT doc_id AS media_id, CAST(f.i AS BIGINT) AS frame_idx,
      |  CAST(length(text) // 4 AS BIGINT) AS frame_len,
      |  md5(substr(text, f.i * (length(text) // 4) + 1, length(text) // 4)) AS frame_md5
      |FROM documents
      |CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) f""".stripMargin

  /** Connected-components dedup canonicalization under the gate: the exact
    * Jaccard pairs from q26 become an undirected graph; each document maps
    * to the min doc_id reachable through near-duplicate links (its cluster
    * canonical — [[graft.operators.Dedup.clusters]] min-label propagation).
    * The oracle replays the transitive closure with a recursive CTE, so the
    * distributed iterate-until-fixed-point loop is hash-checked end to end,
    * not just spec'd.
    */
  def q76DedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.clusters(
      graft.operators.Dedup.allPairsJaccard(
        Tables.documents(s, dir), "text", "doc_id",
        threshold = 0.2, shingleSize = 3))
      .select(col("id"), col("cluster"))

  val q76Sql: String =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
      |        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))) AS shingle FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |pairs AS (SELECT id_a, id_b FROM shared
      |          JOIN sizes sa ON id_a = sa.doc_id
      |          JOIN sizes sb ON id_b = sb.doc_id
      |          WHERE shared*1.0/(sa.n + sb.n - shared) >= 0.2),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
      |SELECT id, min(r) AS cluster FROM reach GROUP BY id""".stripMargin

  /** SCD-2 snapshot merge under the gate (reference I7,
    * security_master.py:894-980): apply a daily ticker→CIK snapshot to the
    * q45 derived master — matched (symbol, cik) rows get their era extended
    * to the as-of day; unseen keys become new securities with fresh
    * sequential ids. Previously spec-only; the oracle replays extension,
    * anti-join insert, and id assignment in SQL.
    */
  def q77ScdMerge(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    // Snapshot sees the CURRENT era symbols (the ".N" rename) for a third
    // of customers, plus brand-new listings derived from supplier.
    val snapExisting = c.filter(col("c_custkey") % 3 === 0).select(
      concat(col("c_name"), lit(".N")).as("symbol"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("cik"),
      col("c_name").as("company"))
    val snapNew = Tables.supplier(s, dir).select(
      col("s_name").as("symbol"),
      lpad((col("s_suppkey") + 900000).cast("string"), 10, "0").as("cik"),
      col("s_name").as("company"))
    // applySnapshot consumes the master in three subplans (extension join,
    // existing-key anti-join, max-sid agg) — materialize the dimension
    // build, as q45 does, instead of re-running its prefix-sum assignment
    // three times (and instead of cache(), whose CacheManager entry would
    // pin the blocks for the session's lifetime).
    graft.master.SecurityMaster.applySnapshot(
        graft.operators.Materialize.once(MasterQueries.deriveMaster(s, dir)),
        snapExisting.unionByName(snapNew),
        java.sql.Date.valueOf("2003-06-30"))
      .select(col("security_id"), col("permno"), col("symbol"), col("cik"),
        date_format(col("start_date"), "yyyy-MM-dd").as("start_date"),
        date_format(col("end_date"), "yyyy-MM-dd").as("end_date"))
  }

  val q77Sql: String =
    """WITH master AS (
      |  SELECT 1000 + dense_rank() OVER (ORDER BY c_custkey) AS security_id,
      |    CAST(c_custkey AS BIGINT) AS permno, c_name AS symbol,
      |    lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cik,
      |    DATE '1994-01-01' AS start_date,
      |    DATE '1997-01-01' + CAST(c_custkey % 400 AS INT) * INTERVAL 1 DAY
      |      - INTERVAL 1 DAY AS end_date
      |  FROM customer
      |  UNION ALL
      |  SELECT 1000 + dense_rank() OVER (ORDER BY c_custkey),
      |    CAST(c_custkey AS BIGINT), c_name || '.N',
      |    lpad(CAST(c_custkey AS VARCHAR), 10, '0'),
      |    DATE '1997-01-01' + CAST(c_custkey % 400 AS INT) * INTERVAL 1 DAY,
      |    DATE '2002-12-31'
      |  FROM customer),
      |snap AS (
      |  SELECT symbol, cik, min(company) AS company FROM (
      |    SELECT c_name || '.N' AS symbol,
      |      lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cik, c_name AS company
      |    FROM customer WHERE c_custkey % 3 = 0
      |    UNION ALL
      |    SELECT s_name, lpad(CAST(s_suppkey + 900000 AS VARCHAR), 10, '0'), s_name
      |    FROM supplier) u
      |  GROUP BY 1, 2),
      |extended AS (
      |  SELECT m.security_id, m.permno, m.symbol, m.cik, m.start_date,
      |    CASE WHEN s.symbol IS NOT NULL AND m.end_date < DATE '2003-06-30'
      |         THEN DATE '2003-06-30' ELSE m.end_date END AS end_date
      |  FROM master m LEFT JOIN snap s ON m.symbol = s.symbol AND m.cik = s.cik),
      |added AS (
      |  SELECT (SELECT max(security_id) FROM master)
      |      + row_number() OVER (ORDER BY symbol, cik) AS security_id,
      |    CAST(NULL AS BIGINT) AS permno, symbol, cik,
      |    DATE '2003-06-30' AS start_date, DATE '2003-06-30' AS end_date
      |  FROM snap s
      |  WHERE NOT EXISTS (SELECT 1 FROM master m
      |                    WHERE m.symbol = s.symbol AND m.cik = s.cik))
      |SELECT security_id, permno, symbol, cik,
      |  strftime(start_date, '%Y-%m-%d') AS start_date,
      |  strftime(end_date, '%Y-%m-%d') AS end_date
      |FROM (SELECT * FROM extended UNION ALL SELECT * FROM added) z""".stripMargin

  /** Binned range join ([[graft.operators.RangeJoin]]): point-in-interval
    * with NO equality key and NO broadcastable side — the shape where a
    * naive plan degenerates to a nested-loop product. Binning turns it into
    * a hash join on floor(day/W); the oracle is the plain BETWEEN join
    * (result-invariant technique, like q57-q59). Interval widths (1-4
    * days) are sized so matches stay O(orders), and W=4 covers any
    * interval with ≤2 bins.
    */
  def q78RangeBinJoin(s: SparkSession, dir: String): DataFrame = {
    val points = Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_totalprice"),
      datediff(col("o_orderdate").cast("date"),
        lit("1990-01-01").cast("date")).cast("long").as("day"))
    val intervals = Tables.part(s, dir).select(
      col("p_brand"),
      (lit(730L) + col("p_partkey") % 2000).cast("long").as("start_day"),
      (lit(730L) + col("p_partkey") % 2000 + col("p_partkey") % 4)
        .cast("long").as("end_day"))
    graft.operators.RangeJoin.binnedPointInterval(
        points, intervals, "day", "start_day", "end_day", binWidth = 4L)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_matches"),
        ExactAgg.fixedSum(col("o_totalprice"), 2).as("matched_revenue"))
  }

  val q78Sql: String =
    """WITH points AS (
      |  SELECT o_orderkey, o_totalprice,
      |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day
      |  FROM orders),
      |intervals AS (
      |  SELECT p_brand, 730 + p_partkey % 2000 AS start_day,
      |    730 + p_partkey % 2000 + p_partkey % 4 AS end_day
      |  FROM part)
      |SELECT p_brand, count(*) AS n_matches,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS matched_revenue
      |FROM points JOIN intervals ON day BETWEEN start_day AND end_day
      |GROUP BY p_brand""".stripMargin

  /** Count-min sketch ([[graft.operators.Sketches]]): heavy-hitter token
    * frequencies estimated from a 4×256 sketch, reported beside the exact
    * counts for the 20 most frequent tokens. The md5-salted row hashes are
    * engine-portable, so the oracle rebuilds the identical sketch and the
    * whole estimate — collisions included — is under the exact hash gate
    * (CMS estimates are deterministic overestimates, never RNG).
    */
  def q92CountMinSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val toks = Tables.documents(s, dir)
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    val probes = exact.orderBy(col("exact_n").desc, col("tok").asc).limit(20)
    val cms = Sketches.cmsBuild(toks, "tok", width = 256, depth = 4)
    Sketches.cmsEstimate(cms, probes.select(col("tok")), "tok", width = 256, depth = 4)
      .join(probes, "tok")
      .select(col("tok"), col("exact_n"), col("cms_estimate"))
  }

  val q92Sql: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                x -> x <> '')) AS tok
      |  FROM documents),
      |rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
      |hashed AS (
      |  SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8)
      |    AS BIGINT) % 256 AS b
      |  FROM toks CROSS JOIN rws),
      |cms AS (SELECT r, b, count(*) AS c FROM hashed GROUP BY 1, 2),
      |exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY 1),
      |probes AS (SELECT tok, exact_n FROM exact ORDER BY exact_n DESC, tok ASC LIMIT 20),
      |est AS (
      |  SELECT p.tok, min(c.c) AS cms_estimate
      |  FROM probes p CROSS JOIN rws r2
      |  JOIN cms c ON c.r = r2.r AND c.b =
      |    CAST('0x' || substr(md5(CAST(r2.r AS VARCHAR) || ':' || p.tok), 1, 8)
      |      AS BIGINT) % 256
      |  GROUP BY 1)
      |SELECT p.tok, CAST(p.exact_n AS BIGINT) AS exact_n,
      |  CAST(e.cms_estimate AS BIGINT) AS cms_estimate
      |FROM probes p JOIN est e USING (tok)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q92_countmin_sketch" -> (q92CountMinSketch _),
    "q78_range_bin_join" -> (q78RangeBinJoin _),
    "q77_scd_merge" -> (q77ScdMerge _),
    "q76_dedup_clusters" -> (q76DedupClusters _),
    "q75_frame_sample" -> (q75FrameSample _),
    "q74_stratified_sample" -> (q74StratifiedSample _),
    "q73_perplexity" -> (q73Perplexity _),
    "q72_quantiles" -> (q72Quantiles _),
    "q70_topk_per_key" -> (q70TopkPerKey _),
    "q69_zorder" -> (q69ZOrder _),
    "q68_incremental_agg" -> (q68IncrementalAgg _),
    "q67_coverage_report" -> (q67CoverageReport _),
    "q65_bm25" -> (q65Bm25 _),
    "q64_tfidf" -> (q64TfIdf _),
    "q63_sequence_packing" -> (q63SequencePacking _),
    "q62_symbol_pruning" -> (q62SymbolPruning _),
    "q56_grouping_sets" -> (q56GroupingSets _),
    "q57_salted_join" -> (q57SaltedJoin _),
    "q134_hotkey_salted" -> (q134HotkeySalted _),
    "q58_bucketed_join" -> (q58BucketedJoin _),
    "q59_bloom_prune" -> (q59BloomPrune _),
    "q60_hash_split" -> (q60HashSplit _),
    "q61_rolling_vol" -> (q61RollingVol _))

  val oracleSql: Map[String, String] = Map(
    "q92_countmin_sketch" -> q92Sql,
    "q78_range_bin_join" -> q78Sql,
    "q77_scd_merge" -> q77Sql,
    "q76_dedup_clusters" -> q76Sql,
    "q75_frame_sample" -> q75Sql,
    "q74_stratified_sample" -> q74Sql,
    "q73_perplexity" -> q73Sql,
    "q72_quantiles" -> q72Sql,
    "q70_topk_per_key" -> q70Sql,
    "q69_zorder" -> q69Sql,
    "q68_incremental_agg" -> q68Sql,
    "q67_coverage_report" -> q67Sql,
    "q65_bm25" -> q65Sql,
    "q64_tfidf" -> q64Sql,
    "q63_sequence_packing" -> q63Sql,
    "q62_symbol_pruning" -> q62Sql,
    "q56_grouping_sets" -> q56Sql,
    "q57_salted_join" -> q57Sql,
    "q134_hotkey_salted" -> q134Sql,
    "q58_bucketed_join" -> q58Sql,
    "q59_bloom_prune" -> q59Sql,
    "q60_hash_split" -> q60Sql,
    "q61_rolling_vol" -> q61Sql)
}
