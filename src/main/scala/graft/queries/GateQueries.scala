package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{FooterMetadata, Lake}
import graft.master.SecurityMaster
import graft.streaming.Incremental
import graft.ticks.Calendar

/** Oracle gates for the ten SURVEY §2 operators that were previously
  * spec-only (round-5 verdict ask #2): S13 footer metadata, S14 partition
  * listing, P4 all-null drop, J3 sid→info lookup, J10 FIGI rebrand, A3
  * datapoint dedup, W2 lag-4 YoY, I2 trading-day gate, I5 year-end
  * compaction, I6 stateful stream resume. Each query drives the REAL
  * operator (the same code the specs exercise) and lands on a result the
  * DuckDB oracle can recompute from the fixture tables alone.
  */
object GateQueries {

  type Q = (SparkSession, String) => DataFrame

  private def localFs(s: SparkSession) =
    org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)

  private def rm(s: SparkSession, paths: String*): Unit = {
    val fs = localFs(s)
    paths.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  // once-per-(JVM, root) fixture staging (same discipline as LakeQueries)
  private val staged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** S13 — real parquet footer key-value metadata: export nation as a
    * single self-describing file ([[FooterMetadata.exportWithMetadata]]:
    * row groups appended verbatim, footer rewritten with the merged KV),
    * read the footer back with parquet-hadoop, and prove the file stayed
    * Spark-readable by re-reading its rows. Reference
    * security_master.py:828-892 (crsp_end_date / export_timestamp /
    * version / row_count embedded in the export's own footer).
    */
  def q113FooterMeta(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir)
    val path = s"/tmp/graft_q113_export_${math.abs(dir.hashCode)}.parquet"
    FooterMetadata.exportWithMetadata(nation, path,
      crspEndDate = "2002-12-31", exportTimestamp = "2026-01-01T00:00:00Z")
    val (rows, meta) = FooterMetadata.loadWithMetadata(s, path)
    // project the four contract keys (the footer also carries Spark's own
    // schema key, which is what keeps the file Spark-readable) and a
    // re-read row count proving the append-file byte copy kept data intact
    val entries =
      Seq("crsp_end_date", "export_timestamp", "row_count", "version")
        .map(k => (k, meta(k))) :+ ("reread_rows", rows.count().toString)
    val s2 = s; import s2.implicits._
    entries.toDF("key", "value")
  }

  val q113Sql: String =
    """SELECT 'crsp_end_date' AS key, '2002-12-31' AS value
      |UNION ALL SELECT 'export_timestamp', '2026-01-01T00:00:00Z'
      |UNION ALL SELECT 'row_count', CAST((SELECT count(*) FROM nation) AS VARCHAR)
      |UNION ALL SELECT 'version', '1.0'
      |UNION ALL SELECT 'reread_rows', CAST((SELECT count(*) FROM nation) AS VARCHAR)""".stripMargin

  /** S14 — partition listing + existence probes over a freshly written
    * Hive-partitioned table ([[Lake.listPartitions]] /
    * [[Lake.partitionExists]]; reference list_objects_v2 walking,
    * storage/pipeline/validation.py:84-235). The listing is re-derived
    * from the directory tree, not from what was written, and a probe for
    * a partition that was never written must come back absent.
    */
  def q114LakeListing(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q114_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Lake.overwritePartitions(o, root, "orders_by_year", Seq("o_year"))
    val probes = Lake.listPartitions(s, root, "orders_by_year")
      .map(p => (p, Lake.partitionExists(s, root, "orders_by_year", p))) :+
      ("o_year=2099", Lake.partitionExists(s, root, "orders_by_year", "o_year=2099"))
    val s2 = s; import s2.implicits._
    probes.toDF("partition", "present0")
      .select(col("partition"), col("present0").cast("int").as("present"))
  }

  val q114Sql: String =
    """SELECT concat('o_year=', CAST(year(o_orderdate) AS VARCHAR)) AS partition,
      |  1 AS present
      |FROM orders GROUP BY 1
      |UNION ALL SELECT 'o_year=2099', 0""".stripMargin

  /** P4 — all-null row drop after calendar alignment: per-supplier daily
    * bars left-joined onto the weekday spine ([[Calendar.align]]) produce
    * null-quantity rows for every non-traded weekday, and
    * [[Calendar.dropAllNullRows]] removes exactly those (reference
    * update/app.py:385-393). The surviving set — weekday bars only — is
    * what the oracle recomputes.
    */
  def q115AllnullDrop(s: SparkSession, dir: String): DataFrame = {
    // three consumers (global bounds for the spine, align's per-security
    // bounds, align's grid join) — materialize the daily-bar aggregation
    // once instead of re-aggregating lineitem per consumer
    val bars = graft.operators.Materialize.once(Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").cast("long").as("security_id"),
        col("l_shipdate").cast("date").as("date"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents")))
    val bounds = bars.agg(min(col("date")).as("lo"), max(col("date")).as("hi"))
    val aligned = Calendar.align(bars, Calendar.weekdaySpineFromBounds(bounds))
    Calendar.dropAllNullRows(aligned, Seq("qty_cents"))
      .select(col("security_id"),
        date_format(col("date"), "yyyy-MM-dd").as("day"), col("qty_cents"))
  }

  val q115Sql: String =
    """SELECT CAST(l_suppkey AS BIGINT) AS security_id,
      |  strftime(l_shipdate, '%Y-%m-%d') AS day,
      |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
      |FROM lineitem
      |WHERE isodow(l_shipdate) <= 5
      |GROUP BY 1, 2""".stripMargin

  /** J3 — sid→info lookup: [[SecurityMaster.symbolHistory]] (reference
    * get_symbol_history, security_master.py:762-779) for three known ids
    * of the q45-derived master — each id's full symbol timeline, the
    * pre-rename name then the post-split `.N` rebrand.
    */
  def q116SidLookup(s: SparkSession, dir: String): DataFrame = {
    val master = graft.operators.Materialize.once(
      MasterQueries.deriveMaster(s, dir).coalesce(4))
    Seq(1001L, 1002L, 1003L)
      .map(sid => SecurityMaster.symbolHistory(master, sid)
        .withColumn("security_id", lit(sid)))
      .reduce(_.unionByName(_))
      .select(col("security_id"), col("symbol"),
        date_format(col("start_date"), "yyyy-MM-dd").as("start_day"),
        date_format(col("end_date"), "yyyy-MM-dd").as("end_day"))
  }

  val q116Sql: String =
    """WITH ids AS (SELECT c_custkey, c_name,
      |    1000 + dense_rank() OVER (ORDER BY c_custkey) AS security_id
      |  FROM customer),
      |sel AS (SELECT * FROM ids WHERE security_id IN (1001, 1002, 1003))
      |SELECT security_id, c_name AS symbol,
      |  '1994-01-01' AS start_day,
      |  strftime(DATE '1997-01-01' + CAST(c_custkey % 400 AS INT) - 1, '%Y-%m-%d') AS end_day
      |FROM sel
      |UNION ALL
      |SELECT security_id, c_name || '.N',
      |  strftime(DATE '1997-01-01' + CAST(c_custkey % 400 AS INT), '%Y-%m-%d'), '2002-12-31'
      |FROM sel""".stripMargin

  /** J10 — FIGI rebrand stitching ([[SecurityMaster.rebrandMatches]],
    * reference security_master.py:1105-1136): disappeared × appeared
    * symbols matched on equal share-class FIGI. The %50 key folds several
    * suppliers onto each FIGI, so the match is genuinely many-to-many;
    * odd-key suppliers never reappear and must produce no pair.
    */
  def q117FigiRebrand(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val figi = concat(lit("FIGI"),
      lpad((col("s_suppkey") % 50).cast("string"), 4, "0"))
    val disappeared = sup.select(col("s_name").as("symbol"), figi.as("figi"))
    val appeared = sup.filter(col("s_suppkey") % 2 === 0)
      .select(concat(col("s_name"), lit(".X")).as("symbol"), figi.as("figi"))
    SecurityMaster.rebrandMatches(disappeared, appeared)
  }

  val q117Sql: String =
    """WITH d AS (SELECT s_name AS old_symbol,
      |    'FIGI' || lpad(CAST(s_suppkey % 50 AS VARCHAR), 4, '0') AS figi
      |  FROM supplier),
      |a AS (SELECT s_name || '.X' AS new_symbol,
      |    'FIGI' || lpad(CAST(s_suppkey % 50 AS VARCHAR), 4, '0') AS figi
      |  FROM supplier WHERE s_suppkey % 2 = 0)
      |SELECT old_symbol, new_symbol, figi FROM d JOIN a USING (figi)""".stripMargin

  /** A3 — datapoint dedup inside the EDGAR parse ([[EdgarFacts.parse]]
    * dedup window; reference collection/fundamental.py:47-120): the same
    * (accn, frame, filed) datapoint is planted under BOTH revenue
    * candidate tags with DIFFERENT values — the priority-0 tag's value
    * must win, and the tag-unique datapoint must survive. The conflicting
    * value (`*100+2`) appearing anywhere in the output is the failure.
    */
  def q118DatapointDedup(s: SparkSession, dir: String): DataFrame = {
    val json = format_string(
      """{"cik": %s, "facts": {"us-gaap": {
        |"Revenues": {"units": {"USD": [
        |  {"val": %s, "accn": "A1", "form": "10-K", "filed": "2000-03-01", "frame": "CY1999"}]}},
        |"SalesRevenueNet": {"units": {"USD": [
        |  {"val": %s, "accn": "A1", "form": "10-K", "filed": "2000-03-01", "frame": "CY1999"},
        |  {"val": %s, "accn": "A2", "form": "10-Q", "filed": "2000-06-01", "frame": "CY2000Q1"}]}}
        |}}}""".stripMargin.replace("\n", ""),
      col("n_nationkey").cast("string"),
      (col("n_nationkey") * 100 + 1).cast("string"),
      (col("n_nationkey") * 100 + 2).cast("string"),
      (col("n_nationkey") * 100 + 3).cast("string"))
    graft.fundamental.EdgarFacts.parse(
      Tables.nation(s, dir).select(json.as("body")), "body")
      .select(col("cik"), col("concept"), col("unit"), col("value"),
        col("accn"), col("form"),
        date_format(col("filed"), "yyyy-MM-dd").as("filed_day"),
        col("frame"),
        date_format(col("start"), "yyyy-MM-dd").as("start_day"),
        date_format(col("end"), "yyyy-MM-dd").as("end_day"))
  }

  val q118Sql: String =
    """SELECT lpad(CAST(n_nationkey AS VARCHAR), 10, '0') AS cik,
      |  'rev' AS concept, 'USD' AS unit,
      |  CAST(n_nationkey*100 + 1 AS DOUBLE) AS value, 'A1' AS accn,
      |  '10-K' AS form, '2000-03-01' AS filed_day, 'CY1999' AS frame,
      |  CAST(NULL AS VARCHAR) AS start_day, CAST(NULL AS VARCHAR) AS end_day
      |FROM nation
      |UNION ALL
      |SELECT lpad(CAST(n_nationkey AS VARCHAR), 10, '0'), 'rev', 'USD',
      |  CAST(n_nationkey*100 + 3 AS DOUBLE), 'A2', '10-Q', '2000-06-01',
      |  'CY2000Q1', NULL, NULL
      |FROM nation""".stripMargin

  /** W2 — lag-4 year-over-year on quarterly rows (reference
    * derived/metrics.py:158-163: avg_ast/avg_eqt = (x + lag4(x))/2):
    * quarterly ta/te series per synthetic symbol flow through the REAL
    * [[graft.fundamental.DerivedMetrics.compute]] EAV pipeline (pivot →
    * windowed pass → unpivot); only the two lag-4 metrics survive the
    * null filter because every other input concept is absent.
    */
  def q119YoyLag4(s: SparkSession, dir: String): DataFrame = {
    val qtrEnd = date_sub(
      add_months(to_date(date_trunc("quarter", col("o_orderdate"))), 3), 1)
    val wide = Tables.orders(s, dir)
      .groupBy(
        concat(lit("S"), lpad((col("o_custkey") % 20).cast("string"), 2, "0")).as("symbol"),
        qtrEnd.as("as_of_date"))
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long")).cast("double").as("ta_val"),
        count(lit(1)).cast("double").as("te_val"))
    val eavLong = wide.select(col("symbol"), col("as_of_date"),
      expr("stack(2, 'ta', ta_val, 'te', te_val) as (concept, value)"))
    graft.fundamental.DerivedMetrics.compute(eavLong)
      .filter(col("metric").isin("avg_ast", "avg_eqt"))
      .select(col("symbol"),
        date_format(col("as_of_date"), "yyyy-MM-dd").as("as_of_day"),
        col("metric"), col("value"))
  }

  val q119Sql: String =
    """WITH q AS (SELECT 'S' || lpad(CAST(o_custkey % 20 AS VARCHAR), 2, '0') AS symbol,
      |    CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS as_of_date,
      |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) AS ta,
      |    CAST(count(*) AS DOUBLE) AS te
      |  FROM orders GROUP BY 1, 2),
      |l AS (SELECT symbol, as_of_date,
      |    (ta + lag(ta, 4) OVER (PARTITION BY symbol ORDER BY as_of_date)) / 2 AS avg_ast,
      |    (te + lag(te, 4) OVER (PARTITION BY symbol ORDER BY as_of_date)) / 2 AS avg_eqt
      |  FROM q)
      |SELECT symbol, strftime(as_of_date, '%Y-%m-%d') AS as_of_day,
      |  'avg_ast' AS metric, avg_ast AS value
      |FROM l WHERE avg_ast IS NOT NULL
      |UNION ALL
      |SELECT symbol, strftime(as_of_date, '%Y-%m-%d'), 'avg_eqt', avg_eqt
      |FROM l WHERE avg_eqt IS NOT NULL""".stripMargin

  /** I2 — the trading-day gate ([[Calendar.weekdaySpine]]; reference
    * utils/calendar.py:32-55): one year's weekday spine, each order
    * landing on it counted per month. Weekend order dates must contribute
    * nothing; months differ in weekday count (the gate's actual output).
    */
  def q120TradingGate(s: SparkSession, dir: String): DataFrame = {
    val spine = Calendar.weekdaySpine(s, "1995-01-01", "1995-12-31")
    val o = Tables.orders(s, dir)
      .select(col("o_orderdate").cast("date").as("date"), col("o_orderkey"))
    spine.join(o, Seq("date"), "left")
      .groupBy(month(col("date")).as("month"))
      .agg(countDistinct(col("date")).as("n_trading_days"),
        count(col("o_orderkey")).as("n_orders"))
  }

  val q120Sql: String =
    """WITH spine AS (SELECT CAST(unnest(generate_series(
      |    DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY)) AS DATE) AS date),
      |wd AS (SELECT date FROM spine WHERE isodow(date) <= 5)
      |SELECT CAST(month(date) AS INT) AS month,
      |  CAST(count(DISTINCT date) AS BIGINT) AS n_trading_days,
      |  CAST(count(o_orderkey) AS BIGINT) AS n_orders
      |FROM wd LEFT JOIN orders ON o_orderdate = date
      |GROUP BY 1""".stripMargin

  /** I5 — year-end compaction ([[Lake.compactYears]]; reference
    * update/app.py:447-607, 12 monthlies → history.parquet): two
    * incremental appends fragment every (security_id, year) partition
    * into two files, compaction folds each back to ONE, and the gate
    * checks both the surviving rows AND the physical layout
    * (`_metadata.file_path` distinct count == 1 per partition).
    */
  def q121Compaction(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q121_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    val bars = Tables.lineitem(s, dir).select(
      (col("l_suppkey") % 10).cast("long").as("security_id"),
      year(col("l_shipdate")).as("year"),
      col("l_orderkey"), col("l_quantity"))
    Lake.appendPartitions(bars.filter(col("l_orderkey") % 2 === 0),
      root, "ticks", Seq("security_id", "year"))
    Lake.appendPartitions(bars.filter(col("l_orderkey") % 2 =!= 0),
      root, "ticks", Seq("security_id", "year"))
    // compact every year present in the data (driver-side collect of a
    // handful of distinct years — dimension-sized, not a fact collect)
    val years = Lake.read(s, root, "ticks").select(col("year"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    Lake.compactYears(s, root, "ticks", years)
    Lake.read(s, root, "ticks")
      .groupBy(col("security_id").cast("long").as("security_id"),
        col("year").cast("int").as("year"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("_metadata.file_path")).as("n_files"))
  }

  val q121Sql: String =
    """SELECT CAST(l_suppkey % 10 AS BIGINT) AS security_id,
      |  CAST(year(l_shipdate) AS INT) AS year,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(1 AS BIGINT) AS n_files
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** I6 — stateful stream resume ([[Incremental.runIncrementalToParquet]];
    * reference daily update loop): run one, stage MORE files, run two with
    * the SAME checkpoint — the second run must process only the new files.
    * Any reprocessing doubles counts and fails the oracle; any missed file
    * undershoots it. Exactly-once across restarts, gated end to end.
    */
  def q122StreamResume(s: SparkSession, dir: String): DataFrame = {
    val tag = math.abs(dir.hashCode)
    val src = s"/tmp/graft_q122_src_$tag"
    val sink = s"/tmp/graft_q122_sink_$tag"
    val ckpt = s"${graft.LocalScratch.dir()}/graft_q122_ckpt_$tag"
    rm(s, src, sink, ckpt)
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    def run(): Unit = Incremental.runIncrementalToParquet(
      Incremental.fileStream(s, src, ev.schema), sink, ckpt)
    ev.filter(col("event_id") % 2 === 0).repartition(4)
      .write.mode("append").parquet(src)
    run()
    ev.filter(col("event_id") % 2 =!= 0).repartition(4)
      .write.mode("append").parquet(src)
    run()
    s.read.parquet(sink).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
  }

  val q122Sql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY 1""".stripMargin

  /** §3.3 minute read path ([[graft.ticks.TicksClient.getMinuteTicks]];
    * reference minute layout storage/handlers/ticks.py:441, symbol
    * resolution storage/clients/ticks.py:130-146) over BOTH 2024 DST
    * boundaries — the risk case SURVEY §7.5 #6 names. A 30-minute UTC
    * spine spanning each transition converts to stored ET wall-clock
    * ([[graft.ticks.MinuteBars.utcToEtWallClock]]) and lands in the
    * {sid}/{Y}/{MM}/{DD} lake; the client resolves SYM0 per-day across a
    * mid-year sid reassignment (7000 until June, 7002 from July) and
    * reads each day partition-pruned. The spring day must surface 46
    * half-hour bars (23-hour day, no 02:xx ET), the fall day 50 with the
    * 01:xx ET fold twice (same wall clock, distinct volumes) — the
    * oracle replays the whole chain through DuckDB's own tz engine, so a
    * wrong offset, a missed gap/fold, or mis-routed day directories all
    * break the hash.
    */
  def q126MinuteDst(s: SparkSession, dir: String): DataFrame = {
    import graft.ticks.{MinuteBars, TicksClient}
    val root = s"/tmp/graft_q126_lake_${math.abs(dir.hashCode)}"
    rm(s, root)
    val sids = Tables.nation(s, dir).filter(col("n_nationkey") < 3)
      .select((col("n_nationkey") + 7000L).as("security_id"))
    def spine(startUtc: String, endUtc: String) =
      s.range(1).select(explode(sequence(
        to_timestamp(lit(startUtc)), to_timestamp(lit(endUtc)),
        expr("interval 30 minutes"))).as("utc_ts"))
    val utc = spine("2024-03-09 20:00:00", "2024-03-11 05:30:00")
      .unionByName(spine("2024-11-02 20:00:00", "2024-11-04 05:30:00"))
    val bars = sids.crossJoin(broadcast(utc)) // dim × dim, 3×~140 rows
      .withColumn("ts", MinuteBars.utcToEtWallClock(col("utc_ts")))
      .withColumn("volume", col("security_id") * 100000L +
        (unix_timestamp(col("utc_ts")) / 60).cast("long") % 100000L)
      .select(col("security_id"), col("ts"), col("volume"))
    TicksClient.writeMinuteTicks(bars, root)
    val s2 = s; import s2.implicits._
    val master = Seq(
      ("SYM0", 7000L, "2024-01-01", "2024-06-30"),
      ("SYM0", 7002L, "2024-07-01", "2024-12-31"),
      ("SYM1", 7001L, "2024-01-01", "2024-12-31"))
      .toDF("symbol", "security_id", "start_s", "end_s")
      .select(col("symbol"), col("security_id"),
        col("start_s").cast("date").as("start_date"),
        col("end_s").cast("date").as("end_date"))
    val client = new graft.ticks.TicksClient(s, root, master)
    Seq(("spring", "SYM0", "2024-03-10"), ("fall", "SYM0", "2024-11-03"),
      ("sym1_spring", "SYM1", "2024-03-10"))
      .map { case (probe, sym, day) =>
        client.getMinuteTicks(sym, day).withColumn("probe", lit(probe)) }
      .reduce(_.unionByName(_))
      .select(col("probe"), col("security_id").cast("long").as("security_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm").as("et_min"), col("volume"))
  }

  val q126Sql: String =
    """WITH mins AS (
      |  SELECT unnest(generate_series(TIMESTAMP '2024-03-09 20:00:00',
      |    TIMESTAMP '2024-03-11 05:30:00', INTERVAL 30 MINUTE)) AS utc_naive
      |  UNION ALL
      |  SELECT unnest(generate_series(TIMESTAMP '2024-11-02 20:00:00',
      |    TIMESTAMP '2024-11-04 05:30:00', INTERVAL 30 MINUTE))),
      |sids AS (SELECT CAST(n_nationkey + 7000 AS BIGINT) AS security_id
      |         FROM nation WHERE n_nationkey < 3),
      |bars AS (
      |  SELECT s.security_id,
      |    timezone('America/New_York', utc_naive AT TIME ZONE 'UTC') AS et_ts,
      |    s.security_id*100000 + CAST(epoch(utc_naive)/60 AS BIGINT) % 100000 AS volume
      |  FROM sids s CROSS JOIN mins),
      |probes AS (
      |  SELECT 'spring' AS probe, CAST(7000 AS BIGINT) AS sid, DATE '2024-03-10' AS day
      |  UNION ALL SELECT 'fall', 7002, DATE '2024-11-03'
      |  UNION ALL SELECT 'sym1_spring', 7001, DATE '2024-03-10')
      |SELECT p.probe, b.security_id,
      |  strftime(b.et_ts, '%Y-%m-%d %H:%M') AS et_min, b.volume
      |FROM probes p JOIN bars b
      |  ON b.security_id = p.sid AND CAST(b.et_ts AS DATE) = p.day""".stripMargin

  /** SQL catalog surface ([[graft.sql.GraftCatalog]]): the §7.3 flagship
    * slice — "daily closes for a symbol over a rename boundary" — as PURE
    * SQL against catalog identifiers, no path-shaped API in sight. A
    * 3-security master (SYMR carried by sid 9000 until 2023-06-30, by sid
    * 9002 after — the FB→META shape, reference security_master.py:762-779)
    * and two years of deterministic daily bars land in the lake layout
    * (`Lake.overwritePartitions`, partitioned security_id/year); the
    * catalog is installed and the query joins `graft.daily_ticks` to
    * `graft.master` on the interval, routing each day to the sid that
    * carried the symbol then. `t.year = 2023` is a STATIC partition
    * filter through the V2 ParquetTable (SqlCatalogSpec asserts it prunes
    * the scan to the year's directories and the sid panel); the oracle
    * replays master + bar formulas entirely in DuckDB.
    */
  def q205SqlCatalog(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q205_lake_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        rm(s, root)
        val sids = Tables.nation(s, dir).filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + 9000L).as("security_id"))
        val days = s.range(1).select(explode(sequence(
          lit("2023-01-01").cast("date"), lit("2024-12-31").cast("date"),
          expr("interval 1 day"))).as("date"))
        val bars = sids.crossJoin(broadcast(days)) // dim × dim: 3 × 731 rows
          .filter(year(col("date")) === 2023 || col("security_id") === 9001L)
          .select(col("security_id"), col("date"),
            (col("security_id") * 10 +
              datediff(col("date"), lit("2023-01-01").cast("date")) % 97)
              .cast("long").as("close_cents"),
            year(col("date")).as("year"))
        graft.lake.Lake.overwritePartitions(bars, root, "daily_ticks",
          Seq("security_id", "year"))
        val s2 = s; import s2.implicits._
        val master = Seq(
          ("SYMR", 9000L, "2023-01-01", "2023-06-30"),
          ("SYMR", 9002L, "2023-07-01", "2023-12-31"),
          ("OTHR", 9001L, "2023-01-01", "2024-12-31"))
          .toDF("symbol", "security_id", "start_s", "end_s")
          .select(col("symbol"), col("security_id"),
            col("start_s").cast("date").as("start_date"),
            col("end_s").cast("date").as("end_date"))
        graft.lake.Lake.overwritePartitions(master, root, "master", Seq.empty)
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    graft.sql.GraftCatalog.install(s, "graft", root)
    s.sql("""
      SELECT m.symbol, date_format(t.date, 'yyyy-MM-dd') AS day,
             CAST(t.security_id AS BIGINT) AS security_id, t.close_cents
      FROM graft.daily_ticks t
      JOIN graft.master m
        ON t.security_id = m.security_id
       AND t.date BETWEEN m.start_date AND m.end_date
      WHERE m.symbol = 'SYMR' AND t.year = 2023""")
  }

  val q205Sql: String =
    """WITH sids AS (SELECT CAST(n_nationkey + 9000 AS BIGINT) AS security_id
      |              FROM nation WHERE n_nationkey < 3),
      |days AS (SELECT CAST(unnest(generate_series(DATE '2023-01-01',
      |           DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
      |bars AS (SELECT s.security_id, d.d,
      |    CAST(s.security_id*10 + (d.d - DATE '2023-01-01') % 97 AS BIGINT)
      |      AS close_cents
      |  FROM sids s CROSS JOIN days d
      |  WHERE year(d.d) = 2023 OR s.security_id = 9001),
      |master AS (
      |  SELECT 'SYMR' AS symbol, CAST(9000 AS BIGINT) AS sid,
      |    DATE '2023-01-01' AS sd, DATE '2023-06-30' AS ed
      |  UNION ALL SELECT 'SYMR', 9002, DATE '2023-07-01', DATE '2023-12-31'
      |  UNION ALL SELECT 'OTHR', 9001, DATE '2023-01-01', DATE '2024-12-31')
      |SELECT m.symbol, strftime(b.d, '%Y-%m-%d') AS day,
      |  b.security_id, b.close_cents
      |FROM bars b JOIN master m
      |  ON b.security_id = m.sid AND b.d BETWEEN m.sd AND m.ed
      |WHERE m.symbol = 'SYMR' AND year(b.d) = 2023""".stripMargin

  /** JPEG pixel decode, end to end (round-6 verdict ask #5): the one
    * decode path q100/q124 don't reach (they gate BMP/PNG). Each doc id
    * renders a smooth RGB gradient — `px(y,x,ch) = 32 + id%16 + 2y + 2x +
    * 3ch`, DC + low-frequency only, which baseline JPEG reproduces within
    * a few counts per sample — encodes it through the JDK's real ImageIO
    * JPEG writer (quality 0.95) on the executors — cached once per
    * fixture by [[MediaFixtures.jpegPattern5]] — then decodes the SAME
    * bytes with [[graft.multimodal.JpegDecode]] (first-principles T.81
    * walk: tables, zigzag, DC prediction, IDCT, YCbCr). The result row
    * carries the decoded geometry plus two agreement verdicts:
    * `agrees_jdk` (max per-sample diff vs the JDK's own reader ≤ 10 —
    * two correct decoders differ only by IDCT/upsampling slack, measured
    * max 5 in JpegDecodeSpec) and `near_formula` (mean diff vs the
    * generating formula ≤ 4 — encode loss at q0.95 is ~1 count/sample).
    * The DuckDB oracle replays geometry and verdicts from the formula
    * alone, so a broken huffman table, zigzag order, predictor, color
    * matrix, or dimension parse flips a verdict or nulls the geometry and
    * breaks the hash.
    */
  def q127JpegDecode(s: SparkSession, dir: String): DataFrame =
    jpegDecodeGate(MediaFixtures.jpegPattern5(s, dir))

  /** q199: PROGRESSIVE-JPEG decode through the identical verdict body —
    * the payloads are [[MediaFixtures.jpegProgressive19]]'s SOF2 streams
    * (ImageIO MODE_DEFAULT scan script: spectral selection + successive
    * approximation), decoded by [[graft.multimodal.JpegDecode]]'s T.81
    * annex-G path (cross-scan coefficient accumulation, EOB runs,
    * refinement bits). The oracle replays q127's formula verdicts on the
    * %19 slice: a quarantined SOF2 (the pre-round-10 behavior) nulls the
    * geometry and flips both verdicts, so this gate pins the quarantine
    * as LIFTED.
    */
  def q199ProgressiveJpeg(s: SparkSession, dir: String): DataFrame =
    jpegDecodeGate(MediaFixtures.jpegProgressive19(s, dir))

  /** Shared q127/q199 verdict body: decode with the first-principles
    * T.81 decoder, cross-check against the JDK's reader (max per-sample
    * diff ≤ 10) and the generating formula (mean diff ≤ 4). JDK-encoded
    * payloads come from the once-per-fixture cache so the gates time the
    * DECODE + cross-check, not the encode scaffolding.
    */
  private def jpegDecodeGate(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("agrees_jdk", BooleanType),
      StructField("near_formula", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "w", "h", "payload").mapPartitions { rows =>
      // memory-cached ImageIO streams JVM-wide: the default file cache
      // creates+deletes a /tmp file per ImageIO.read call — at bench scale
      // that is tens of thousands of file churns per trial
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        val bytes = r.getAs[Array[Byte]](3)
        def px(y: Int, x: Int, ch: Int): Int =
          math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)
        graft.multimodal.JpegDecode.decode(bytes) match {
          case Some(img) =>
            val jdk = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            var maxJdk = 0; var sumFormula = 0L
            var yy = 0
            while (yy < h) {
              var xx = 0
              while (xx < w) {
                val rgb = jdk.getRGB(xx, yy)
                var ch = 0
                while (ch < 3) {
                  val mine = img.at(yy, xx, ch)
                  val dJ = math.abs(mine - ((rgb >> ((2 - ch) * 8)) & 0xff))
                  if (dJ > maxJdk) maxJdk = dJ
                  sumFormula += math.abs(mine - px(yy, xx, ch))
                  ch += 1
                }
                xx += 1
              }
              yy += 1
            }
            val meanFormula = sumFormula.toDouble / (w.toLong * h * 3)
            Row(id, img.width, img.height, img.channels,
              maxJdk <= 10, meanFormula <= 4.0)
          case None => Row(id, null, null, null, false, false)
        }
      }
    }(enc)
  }

  /** q212: ARITHMETIC-coded (SOF9) JPEG decode — the last sequential-mode
    * entropy coder the decode stage had quarantined. Payloads are
    * [[MediaFixtures.jpegArith13]]'s in-repo-encoded streams (ImageIO
    * cannot write SOF9, so no JDK cross-decode exists — JpegArithSpec
    * carries the byte-exact QM round-trip and restart evidence instead);
    * the gate decodes with [[graft.multimodal.JpegDecode]]'s annex-D/F
    * path (QM coder, DC/AC conditioning contexts, DAC parse, RST resets)
    * and verdicts against the generating formula: mean |diff| ≤ 4 and max
    * |diff| ≤ 10 (measured ≤ 4 at flat quant 2 incl. restart streams). A
    * quarantined SOF9 (the pre-round-13 behavior) nulls the geometry and
    * flips both verdicts.
    */
  def q212ArithJpeg(s: SparkSession, dir: String): DataFrame =
    arithJpegGate(MediaFixtures.jpegArith13(s, dir))

  /** q215: ARITHMETIC-PROGRESSIVE (SOF10) decode — the one remaining
    * DCT-based JPEG mode after q212/q214, combining the q199 progressive
    * machinery (cross-scan coefficient store, band scans, successive
    * approximation) with the q212 QM coder under the annex-G models
    * (per-scan statistics, fixed-bin DC refinement, AC refine's kex
    * end-of-band discipline). Payloads from [[MediaFixtures
    * .jpegArithProg31]]; same formula verdicts as q212 — a quarantined
    * SOF10 (the pre-round-13 behavior) nulls geometry and flips both.
    */
  def q215ArithProgressive(s: SparkSession, dir: String): DataFrame =
    arithJpegGate(MediaFixtures.jpegArithProg31(s, dir))

  /** q216: HIERARCHICAL decode (T.81 annex J, same-resolution form) —
    * DHP frame header, a coarse non-differential SOF9 base frame, and a
    * differential SOF13 residual frame (no level shift, DC prediction
    * frozen at zero) whose IDCT output ADDS to the base's reference
    * planes. The base alone misses the formula by design (quant 16), so
    * the verdicts only pass when the differential frame is actually
    * applied; EXP resolution pyramids and Huffman/progressive
    * differential frames stay quarantined (JpegArithSpec pins those).
    */
  def q216HierJpeg(s: SparkSession, dir: String): DataFrame =
    arithJpegGate(MediaFixtures.jpegHier37(s, dir))

  val q216Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  TRUE AS near_formula_mean, TRUE AS near_formula_max
      |FROM documents WHERE doc_id % 37 = 0""".stripMargin

  /** q217: LOSSLESS JPEG decode (T.81 annex H, SOF3) — predictor-based,
    * no DCT, and the verdict is EXACTNESS: every decoded sample must
    * equal the generating pseudo-noise formula bit for bit (content is
    * deliberately non-smooth — lossless has to be exact on arbitrary
    * data). The fixture cycles all seven annex-H predictors by id, so a
    * single broken predictor breaks a seventh of the rows.
    */
  def q217LosslessJpeg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("lossless_exact", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    MediaFixtures.jpegLossless41(s, dir)
      .select("media_id", "w", "h", "payload").mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          val bytes = r.getAs[Array[Byte]](3)
          def px(y: Int, x: Int, ch: Int): Int =
            (((id % 251) * 31 + y * 17 + x * 7 + ch * 3) % 256).toInt
          graft.multimodal.JpegDecode.decode(bytes) match {
            case Some(img) =>
              var exact = true
              var yy = 0
              while (yy < h && exact) {
                var xx = 0
                while (xx < w && exact) {
                  var ch = 0
                  while (ch < 3 && exact) {
                    if (img.at(yy, xx, ch) != px(yy, xx, ch)) exact = false
                    ch += 1
                  }
                  xx += 1
                }
                yy += 1
              }
              Row(id, img.width, img.height, img.channels, exact)
            case None => Row(id, null, null, null, false)
          }
        }
      }(enc)
  }

  val q217Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels, TRUE AS lossless_exact
      |FROM documents WHERE doc_id % 41 = 0""".stripMargin

  /** Shared q212/q215 verdict body: decode with the first-principles
    * decoder, verdicts against the generating formula (no JDK
    * cross-decode exists for arithmetic streams — JpegArithSpec carries
    * the byte-exact round-trip evidence instead).
    */
  private def arithJpegGate(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("near_formula_mean", BooleanType),
      StructField("near_formula_max", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "w", "h", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        val bytes = r.getAs[Array[Byte]](3)
        def px(y: Int, x: Int, ch: Int): Int =
          math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)
        graft.multimodal.JpegDecode.decode(bytes) match {
          case Some(img) =>
            var maxD = 0; var sumD = 0L
            var yy = 0
            while (yy < h) {
              var xx = 0
              while (xx < w) {
                var ch = 0
                while (ch < 3) {
                  val d = math.abs(img.at(yy, xx, ch) - px(yy, xx, ch))
                  if (d > maxD) maxD = d
                  sumD += d
                  ch += 1
                }
                xx += 1
              }
              yy += 1
            }
            val mean = sumD.toDouble / (w.toLong * h * 3)
            Row(id, img.width, img.height, img.channels,
              mean <= 4.0, maxD <= 10)
          case None => Row(id, null, null, null, false, false)
        }
      }
    }(enc)
  }

  val q215Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  TRUE AS near_formula_mean, TRUE AS near_formula_max
      |FROM documents WHERE doc_id % 31 = 0""".stripMargin

  val q212Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  TRUE AS near_formula_mean, TRUE AS near_formula_max
      |FROM documents WHERE doc_id % 13 = 0""".stripMargin

  /** q214: 12-BIT JPEG decode (T.81 extended precision) — samples live in
    * [512, 4095], entirely above what an 8-bit pipeline can represent.
    * Payloads are [[MediaFixtures.jpeg12Bit29]]'s SOF9 streams; the
    * decoder must scale the level shift (2048), the clamp (4095), and
    * accept extended precision in the frame header; output keeps full
    * 12-bit values (the 16-bit-PNG convention). Verdicts: formula
    * agreement at 12-bit tolerances and `twelve_bit` — at least one
    * decoded sample above 255, which an 8-bit clamp (or a quarantining
    * pre-round-13 decoder) makes false.
    */
  def q214Jpeg12Bit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("near_formula_mean", BooleanType),
      StructField("twelve_bit", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    MediaFixtures.jpeg12Bit29(s, dir)
      .select("media_id", "w", "h", "payload").mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          val bytes = r.getAs[Array[Byte]](3)
          def px(y: Int, x: Int, ch: Int): Int =
            math.min(512 + (id % 16).toInt * 16 + 32 * y + 32 * x + 48 * ch, 4095)
          graft.multimodal.JpegDecode.decode(bytes) match {
            case Some(img) =>
              var sumD = 0L; var big = false
              var yy = 0
              while (yy < h) {
                var xx = 0
                while (xx < w) {
                  var ch = 0
                  while (ch < 3) {
                    val v = img.at(yy, xx, ch)
                    sumD += math.abs(v - px(yy, xx, ch))
                    if (v > 255) big = true
                    ch += 1
                  }
                  xx += 1
                }
                yy += 1
              }
              val mean = sumD.toDouble / (w.toLong * h * 3)
              Row(id, img.width, img.height, img.channels, mean <= 6.0, big)
            case None => Row(id, null, null, null, false, false)
          }
        }
      }(enc)
  }

  val q214Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  TRUE AS near_formula_mean, TRUE AS twelve_bit
      |FROM documents WHERE doc_id % 29 = 0""".stripMargin

  val q127Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  TRUE AS agrees_jdk, TRUE AS near_formula
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  val q199Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |  CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |  CAST(3 AS INT) AS channels,
      |  TRUE AS agrees_jdk, TRUE AS near_formula
      |FROM documents WHERE doc_id % 19 = 0""".stripMargin

  /** Unicode normalization, end to end: each doc id appends a deterministic
    * accent-bearing suffix in a mix of PRECOMPOSED and DECOMPOSED forms
    * (distinct byte sequences, identical visible text), then the
    * [[graft.text.Normalization]] pipeline — the codegen'd
    * [[graft.expressions.UnicodeNormalize]] kernel plus built-ins — emits
    * the NFC form's md5/length and the canonical dedup key (NFC →
    * accent-fold → lower). The DuckDB oracle rebuilds the same suffixes
    * from chr() codepoints and replays through its OWN independent Unicode
    * engine (`nfc_normalize`, `strip_accents`): two implementations of
    * UAX #15 must agree byte-for-byte or the hash breaks. Rows whose
    * decomposed/precomposed pair collapses to the same canonical md5 prove
    * the dedup-key property the operator exists for.
    */
  def q128UnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Normalization
    // Explicit \u escapes (backslash-u in SOURCE, expanded by scalac): the
    // precomposed and decomposed pairs must stay DIFFERENT byte sequences,
    // and raw combining-mark bytes would not survive a normalizing
    // editor/formatter pass over this file.
    val variants = array(
      lit("caf\u00e9 au lait"),                         // precomposed e-acute
      lit("cafe\u0301 au lait"),                        // decomposed e + U+0301
      lit("na\u00efve r\u00e9sum\u00e9"),             // precomposed
      lit("nai\u0308ve re\u0301sume\u0301"),          // decomposed
      lit("Stra\u00dfe zur H\u00f6lle"),               // sharp-s kept, o-uml precomposed
      lit("Stra\u00dfe zur Ho\u0308lle"))              // sharp-s kept, o + U+0308
    // doc_id % 5 is COPRIME to 6, so the %6 variant index cycles through
    // ALL six variants (a %3 filter would visit only indices 0 and 3 and
    // leave the paired spellings untested)
    val variant = element_at(variants, (col("doc_id") % 6 + 1).cast("int"))
    val raw = Tables.documents(s, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), variant.as("suffix"),
        concat(substring(col("text"), 1, 24), lit(" | "), variant).as("raw"))
    raw.select(
      col("doc_id"),
      length(col("raw")).as("raw_len"),
      md5(Normalization.nfc(col("raw")).cast("binary")).as("nfc_md5"),
      length(Normalization.nfc(col("raw"))).as("nfc_len"),
      md5(Normalization.canonical(col("raw")).cast("binary")).as("canon_md5"),
      // canonical of the bare variant: each precomposed/decomposed PAIR
      // shares this value across rows — the dedup-key collapse property,
      // visible in (and hash-checked through) the gate output itself
      md5(Normalization.canonical(col("suffix")).cast("binary")).as("variant_canon_md5"))
  }

  val q128Sql: String =
    """WITH v AS (
      |  SELECT * FROM (VALUES
      |    (0, 'caf' || chr(233) || ' au lait'),
      |    (1, 'cafe' || chr(769) || ' au lait'),
      |    (2, 'na' || chr(239) || 've r' || chr(233) || 'sum' || chr(233)),
      |    (3, 'nai' || chr(776) || 've re' || chr(769) || 'sume' || chr(769)),
      |    (4, 'Stra' || chr(223) || 'e zur H' || chr(246) || 'lle'),
      |    (5, 'Stra' || chr(223) || 'e zur Ho' || chr(776) || 'lle')) t(i, s)),
      |raw AS (
      |  SELECT doc_id, v.s AS suffix,
      |    substring(text, 1, 24) || ' | ' || v.s AS raw
      |  FROM documents JOIN v ON v.i = doc_id % 6
      |  WHERE doc_id % 5 = 0)
      |SELECT doc_id, CAST(length(raw) AS INT) AS raw_len,
      |  md5(nfc_normalize(raw)) AS nfc_md5,
      |  CAST(length(nfc_normalize(raw)) AS INT) AS nfc_len,
      |  md5(lower(strip_accents(nfc_normalize(raw)))) AS canon_md5,
      |  md5(lower(strip_accents(nfc_normalize(suffix)))) AS variant_canon_md5
      |FROM raw""".stripMargin

  /** Incremental ANN index maintenance ([[graft.operators.AnnIndex
    * .append]]): build the index on 80% of the corpus, append the
    * remaining 20% as a later batch against the STORED centroids, probe
    * the maintained index. The oracle replays assignment + probe over the
    * WHOLE corpus in one pass — the gate's invariant is exactly
    * "append-maintained index ≡ full rebuild", so a broken append (lost
    * rows, re-derived centroids, wrong cell routing) changes the probe's
    * candidate sets and breaks the hash. Probes re-rounded to 9dp as in
    * q110.
    */
  def q129AnnAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // UNIQUE root per invocation (not path-keyed): the gate's point is to
    // exercise build+append each run, and a shared path-keyed root would
    // race concurrent runs over the same fixture dir (one rm'ing while the
    // other probes) and could serve a stale index — the exact hazard q110
    // solved with content fingerprints. Dirs are /tmp-small and reaped
    // with the OS tmp cleanup; the returned probe reads lazily, so the
    // directory must outlive this call.
    val root = s"/tmp/graft_q129_index_${math.abs(dir.hashCode)}_${System.nanoTime()}"
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val corpus = emb.filter(col("vec_id") % 100 =!= 0) // queries never stored
    graft.operators.AnnIndex.build(
      corpus.filter(col("vec_id") % 5 =!= 4), cents, root)
    // the daily batch: appended later, against the stored centroid table
    graft.operators.AnnIndex.append(
      corpus.filter(col("vec_id") % 5 === 4), root)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    graft.operators.AnnIndex.probe(s, root, queries, k = 10, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos_sim_r"), col("rank"))
  }

  val q129Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id % 100 = 50),
      |assign AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT e.vec_id, e.v, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, c.cv) /
      |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM e, cents c WHERE e.vec_id % 100 <> 0)
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
      |  FROM assign a JOIN qcells q USING (cell)),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim_r, rank
      |FROM ranked WHERE rank <= 10""".stripMargin

  // ten-word headers — exactly one segment wide, so prepending them keeps
  // the injection aligned to Boilerplate's segment grid
  private val HdrA =
    "copyright all rights reserved terms of service apply here now"
  private val HdrB =
    "subscribe to our newsletter for updates and exclusive content today"

  /** Corpus-level boilerplate removal ([[graft.text.Boilerplate]], the
    * CCNet/RefinedWeb shared-segment pass): two distinct 10-word headers
    * are planted on deterministic doc strata (doc_id%4 → header A,
    * doc_id%6 → header B, %12 gets both), prepended so each lands on one
    * aligned segment. The REAL operator chunks, counts document
    * frequency, and strips segments in ≥3 docs; the oracle replays
    * injection + segmentation + frequency + ordered reassembly in SQL, so
    * a mis-chunk, an off-by-one in the segment grid, or an unstable
    * reassembly order all break the hash. Docs NOT in either stratum must
    * come through verbatim (their segments are corpus-unique).
    */
  def q130Boilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 0, lit(HdrA + " ")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(HdrB + " ")).otherwise(lit("")),
        col("text")).as("text"))
    graft.text.Boilerplate.removeFrequentSegments(
      docs, "text", "doc_id", segWords = 10, minDocs = 3)
  }

  val q130Sql: String =
    s"""WITH src AS (SELECT doc_id,
      |    (CASE WHEN doc_id % 4 = 0 THEN '$HdrA ' ELSE '' END) ||
      |    (CASE WHEN doc_id % 6 = 0 THEN '$HdrB ' ELSE '' END) || text AS text
      |  FROM documents),
      |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM src),
      |segs AS (SELECT doc_id, g.i AS seg_idx, g.seg FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(0, (len(t)-1)//10),
      |      i -> {'i': CAST(i AS BIGINT),
      |            'seg': array_to_string(t[i*10+1:i*10+10], ' ')})) AS g
      |    FROM toks)),
      |freq AS (SELECT seg FROM segs GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
      |fl AS (SELECT s.doc_id, s.seg_idx, s.seg, (f.seg IS NOT NULL) AS dup
      |       FROM segs s LEFT JOIN freq f USING (seg))
      |SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_segments,
      |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  coalesce(string_agg(CASE WHEN NOT dup THEN seg END, ' ' ORDER BY seg_idx), '') AS clean_text
      |FROM fl GROUP BY 1""".stripMargin

  /** Entity resolution ([[graft.operators.RecordLinkage]]): every customer
    * name becomes a dirty probe with ONE digit overwritten at a
    * key-derived position (10 + custkey%3 — inside the digit run, outside
    * the blocking key), then linked back by blocking on the
    * perturbation-stable last-4-digit substring + levenshtein ≤ 1 +
    * min-(distance, ref-id) pick. At sf0.1 the last-4 block genuinely
    * collides (custkey vs custkey±10000) and the wrong candidate sits at
    * distance 2 — the threshold and the argmin both do real work.
    */
  def q131EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val p = (lit(10) + (col("c_custkey") % 3)).cast("int")
    val probes = cust.select(col("c_custkey").as("probe_id"),
      concat(col("c_name").substr(lit(1), (p - 1).cast("int")), lit("x"),
        col("c_name").substr((p + 1).cast("int"), lit(18))).as("pname"))
    graft.operators.RecordLinkage.link(
        probes, cust.select(col("c_custkey"), col("c_name")),
        probeId = "probe_id", probeName = "pname",
        refId = "c_custkey", refName = "c_name",
        blockKey = c => c.substr(lit(15), lit(4)), maxDistance = 1)
      .withColumn("distance", col("distance").cast("long"))
  }

  val q131Sql: String =
    """WITH probes AS (SELECT c_custkey AS probe_id,
      |    substr(c_name, 1, CAST(9 + (c_custkey % 3) AS INT)) || 'x' ||
      |    substr(c_name, CAST(11 + (c_custkey % 3) AS INT)) AS pname
      |  FROM customer),
      |cand AS (SELECT p.probe_id, r.c_custkey AS rid,
      |    levenshtein(p.pname, r.c_name) AS dist
      |  FROM probes p JOIN customer r
      |    ON substr(p.pname, 15, 4) = substr(r.c_name, 15, 4)
      |  WHERE levenshtein(p.pname, r.c_name) <= 1),
      |best AS (SELECT probe_id, rid, dist,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY dist, rid) AS rn,
      |    count(*) OVER (PARTITION BY probe_id) AS nc
      |  FROM cand)
      |SELECT b.probe_id, b.rid AS matched_id, CAST(b.dist AS BIGINT) AS distance,
      |  CAST(b.nc AS BIGINT) AS n_candidates
      |FROM best b WHERE rn = 1""".stripMargin

  /** Per-group OLS trend + Pearson correlation ([[graft.operators.Trend]]):
    * quantity-cents against days-since-epoch-midpoint per part stratum.
    * Every moment is an exact integer sum; the doubles derive from
    * sub-2^53 integers through correctly-rounded IEEE ops in the same
    * expression order on both engines, so even the UNROUNDED slope is
    * bit-identical — the 9dp rounding is output convention, not slack.
    */
  def q132OlsTrend(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .withColumn("g", (col("l_partkey") % 50).cast("int"))
    graft.operators.Trend.ols(li, Seq("g"),
        x = datediff(col("l_shipdate").cast("date"),
          lit("1995-06-01").cast("date")),
        y = round(col("l_quantity") * 100).cast("long"))
      .select(col("g"), col("n"),
        round(col("slope"), 9).as("slope_r"),
        round(col("intercept"), 9).as("intercept_r"),
        round(col("corr"), 9).as("corr_r"))
  }

  val q132Sql: String =
    """WITH b AS (SELECT CAST(l_partkey % 50 AS INT) AS g,
      |    date_diff('day', DATE '1995-06-01', CAST(l_shipdate AS DATE)) AS x,
      |    CAST(round(l_quantity*100) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      |  FROM b GROUP BY 1)
      |SELECT g, n,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 9) AS slope_r,
      |  round((CAST(sy AS DOUBLE) -
      |    (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE), 9) AS intercept_r,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) /
      |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 9) AS corr_r
      |FROM m WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0""".stripMargin

  val queries: Map[String, Q] = Map(
    "q132_ols_trend" -> (q132OlsTrend _),
    "q131_entity_resolution" -> (q131EntityResolution _),
    "q130_boilerplate" -> (q130Boilerplate _),
    "q129_ann_append" -> (q129AnnAppend _),
    "q128_unicode_norm" -> (q128UnicodeNorm _),
    "q127_jpeg_decode" -> (q127JpegDecode _),
    "q199_progressive_jpeg" -> (q199ProgressiveJpeg _),
    "q212_arith_jpeg" -> (q212ArithJpeg _),
    "q214_jpeg_12bit" -> (q214Jpeg12Bit _),
    "q215_arith_progressive" -> (q215ArithProgressive _),
    "q216_hier_jpeg" -> (q216HierJpeg _),
    "q217_lossless_jpeg" -> (q217LosslessJpeg _),
    "q126_minute_dst" -> (q126MinuteDst _),
    "q205_sql_catalog" -> (q205SqlCatalog _),
    "q113_footer_meta" -> (q113FooterMeta _),
    "q114_lake_listing" -> (q114LakeListing _),
    "q115_allnull_drop" -> (q115AllnullDrop _),
    "q116_sid_lookup" -> (q116SidLookup _),
    "q117_figi_rebrand" -> (q117FigiRebrand _),
    "q118_datapoint_dedup" -> (q118DatapointDedup _),
    "q119_yoy_lag4" -> (q119YoyLag4 _),
    "q120_trading_gate" -> (q120TradingGate _),
    "q121_compaction" -> (q121Compaction _),
    "q122_stream_resume" -> (q122StreamResume _))

  val oracleSql: Map[String, String] = Map(
    "q132_ols_trend" -> q132Sql,
    "q131_entity_resolution" -> q131Sql,
    "q130_boilerplate" -> q130Sql,
    "q129_ann_append" -> q129Sql,
    "q128_unicode_norm" -> q128Sql,
    "q127_jpeg_decode" -> q127Sql,
    "q212_arith_jpeg" -> q212Sql,
    "q214_jpeg_12bit" -> q214Sql,
    "q215_arith_progressive" -> q215Sql,
    "q216_hier_jpeg" -> q216Sql,
    "q217_lossless_jpeg" -> q217Sql,
    "q199_progressive_jpeg" -> q199Sql,
    "q126_minute_dst" -> q126Sql,
    "q205_sql_catalog" -> q205Sql,
    "q113_footer_meta" -> q113Sql,
    "q114_lake_listing" -> q114Sql,
    "q115_allnull_drop" -> q115Sql,
    "q116_sid_lookup" -> q116Sql,
    "q117_figi_rebrand" -> q117Sql,
    "q118_datapoint_dedup" -> q118Sql,
    "q119_yoy_lag4" -> q119Sql,
    "q120_trading_gate" -> q120Sql,
    "q121_compaction" -> q121Sql,
    "q122_stream_resume" -> q122Sql)
}
