package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Lake
import graft.streaming.Incremental

/** Lake (S10/S11/I3) and Structured-Streaming (I1/I4) behaviors surfaced
  * through the correctness gate: each query performs the side-effecting
  * pipeline and returns a read-back result the oracle can recompute from the
  * source tables (the round-trip must be lossless).
  */
object LakeQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Stage a DataFrame to a parquet dir once per (JVM, sf-dir, name): the
    * streaming queries read their source from disk, and re-materializing an
    * identical deterministic input on every invocation (bench runs each
    * query twice) only re-measures the parquet writer. Keyed by sf dir so
    * different scale factors never share a staging path.
    */
  private val staged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def stageOnce(df: => DataFrame, name: String, dir: String): String = {
    val src = s"/tmp/graft_stage_${name}_${math.abs(dir.hashCode)}"
    if (staged.add(src)) {
      // un-cache on failure: a half-written dir must not be served to the
      // next caller as if staging had succeeded. Repartition to a few fat
      // files: the file stream pays listing + per-file task overhead every
      // micro-batch, and a union plan would otherwise fan out to dozens of
      // small parts.
      try df.repartition(8).write.mode("overwrite").parquet(src)
      catch { case e: Throwable => staged.remove(src); throw e }
    }
    src
  }

  /** S10+S11+I3 — partitioned parquet sink with dynamic partition overwrite:
    * write orders partitioned by year, overwrite the 1995 partition with a
    * filtered slice (idempotent refresh), read back per-year aggregates.
    * Oracle recomputes what the lake must now contain.
    */
  def q43LakeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = "file:///tmp/graft_lake_q43"
    val o = Tables.orders(s, dir)
      .withColumn("year", year(col("o_orderdate")))
    Lake.overwritePartitions(o, root, "orders", Seq("year"))
    // I3: total refresh of ONE partition — 1995 keeps only non-'F' rows
    Lake.overwritePartitions(
      o.filter(col("year") === 1995 && col("o_orderstatus") =!= "F"),
      root, "orders", Seq("year"))
    Lake.read(s, root, "orders")
      .groupBy(col("year").cast("long").as("year"))
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactAgg.fixedSum(col("o_totalprice"), 2).as("total"))
  }

  val q43Sql: String =
    """SELECT year(o_orderdate) AS year, count(*) AS n,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total
      |FROM orders
      |WHERE year(o_orderdate) <> 1995 OR o_orderstatus <> 'F'
      |GROUP BY 1""".stripMargin

  /** I1/I4 — Structured Streaming over the events table (AvailableNow
    * micro-batch): watermarked dedup on event_id, then hourly per-type
    * aggregation; the oracle recomputes the same from the static table.
    * Exercises readStream → stateful dedup → event-time window → sink.
    */
  def q44StreamingWindow(s: SparkSession, dir: String): DataFrame = {
    // stage events into a stream-source directory (ns ts → usable timestamp)
    val ev = Tables.events(s, dir)
      .select(col("event_id"), timestamp_micros((col("ts_ns") / 1000).cast("long")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val src = stageOnce(ev, "events", dir)

    val name = "graft_q44_out"
    // state ≈ |distinct event ids| + |open windows| — 8 state partitions
    // amortize store-commit overhead; the narrowed width lives on a child
    // session (runAvailableNowScoped) so concurrent batch planning on `s`
    // keeps the session default
    val result = Incremental.runAvailableNowScoped(s, { ss =>
      val stream = Incremental.fileStream(ss, src, ev.schema)
      val deduped = Incremental.dedupAppend(stream, "ts", "event_id", "1 day")
      Incremental.windowedCounts(deduped, "ts", "1 hour",
        watermark = None, Seq("event_type"))
    }, name, outputMode = "complete", statePartitions = 8)
    result
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("day"),
        hour(col("window_start")).cast("long").as("hr"),
        col("event_type"), col("n"), col("value_sum"))
  }

  val q44Sql: String =
    """SELECT strftime(CAST(date_trunc('hour', ts) AS DATE), '%Y-%m-%d') AS day,
      |  hour(date_trunc('hour', ts)) AS hr,
      |  event_type, count(*) AS n,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS value_sum
      |FROM events
      |GROUP BY 1, 2, 3""".stripMargin

  /** Custom-state streaming (flatMapGroupsWithState): 12-hour-gap
    * sessionization of the event stream. Each user's staged events carry one
    * SENTINEL event 36 h after the global max timestamp: inside the
    * AvailableNow batch it closes the user's final real session through the
    * ordinary gap logic (no reliance on timer firing order), while the
    * sentinel's own one-event session stays open in state and is never
    * emitted — so the streamed output equals the batch gaps-and-islands
    * oracle exactly.
    */
  def q55StreamingSessions(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 12L * 3600 * 1000000
    // Tables.events#ts is the exact integral ns→µs truncation (TimestampType)
    val ev = Tables.events(s, dir).select(col("ts"), col("user_id"), col("value"))
    val sentinels = ev.select(col("user_id")).distinct()
      .crossJoin(ev.agg(max(col("ts")).as("__gm")))
      .select((col("__gm") + expr("INTERVAL 36 HOURS")).as("ts"),
        col("user_id"), lit(0.0).as("value"))
    val src = stageOnce(ev.unionByName(sentinels), "sessions", dir)

    val name = "graft_q55_out"
    val result = Incremental.runAvailableNowScoped(s, { ss =>
      val stream = Incremental.fileStream(ss, src, ev.schema)
      Incremental.sessionize(stream, "ts", "user_id", "value", gapUs)
    }, name, outputMode = "append", statePartitions = 8)
    result
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("value_sum"))
  }

  val q55Sql: String =
    """WITH s AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 12 HOUR THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |g AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM s)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  count(*) AS n_events,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS value_sum
      |FROM g GROUP BY user_id, sid""".stripMargin

  /** Stream-static join enrichment: the event stream joins a static
    * customer⋈nation dimension INSIDE the streaming query (planned as a
    * broadcast hash join per micro-batch — the standard pattern for
    * enriching a firehose with slowly-changing reference data), then
    * aggregates per (nation, day) with event-time windows. The oracle is the
    * equivalent batch join+aggregate over the same rows.
    */
  def q66StreamEnrich(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("ts"), col("user_id"), col("value"))
    val src = stageOnce(ev, "enrich", dir)
    val dim = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name"))
    val name = "graft_q66_out"
    val result = Incremental.runAvailableNowScoped(s, { ss =>
      val stream = Incremental.fileStream(ss, src, ev.schema)
      stream
        .join(broadcast(dim), Seq("user_id")) // stream-static, per-batch BHJ
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day"), col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .select(col("window.start").as("ws"), col("n_name"), col("n"),
          (col("cents") / 100.0).as("value_sum"))
    }, name, outputMode = "complete", statePartitions = 8)
    result.select(date_format(col("ws"), "yyyy-MM-dd").as("day"),
      col("n_name"), col("n"), col("value_sum"))
  }

  val q66Sql: String =
    """SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
      |  n_name, count(*) AS n,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS value_sum
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2""".stripMargin

  /** Stream-stream inner join with watermarks: purchases vs signups of the
    * same user within 24h (purchase after signup). Both sides are streams;
    * state on each side is bounded by the watermark + the time-range
    * condition (Spark evicts rows that can no longer match). The oracle is
    * the equivalent batch range join.
    *
    * Replay caveat: the staged part-files are hash-distributed, not
    * time-ordered, so oracle equality relies on AvailableNow consuming the
    * whole staging dir as ONE micro-batch (the default — no
    * maxFilesPerTrigger here). Splitting the replay into multiple batches
    * would advance the watermark past still-unread old rows and legitimately
    * drop them — correct streaming semantics, but not the batch oracle. A
    * production deployment feeds time-ordered arrivals, where the 1h bound
    * is the real out-of-orderness tolerance.
    */
  def q71StreamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    val src = stageOnce(ev, "ssj", dir)
    val name = "graft_q71_out"
    val result = Incremental.runAvailableNowScoped(s, { ss =>
      val stream = Incremental.fileStream(ss, src, ev.schema)
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
        .withWatermark("p_ts", "1 hour")
      val signups = stream.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
        .withWatermark("s_ts", "1 hour")
      purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"))
    }, name, outputMode = "append", statePartitions = 8)
    result.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("p_value") * 100).cast("long")).as("cents"))
      .select(col("user_id"), col("n_pairs"), (col("cents") / 100.0).as("value_sum"))
  }

  val q71Sql: String =
    """SELECT p.user_id, count(*) AS n_pairs,
      |  sum(CAST(round(p.value*100) AS BIGINT))/100.0 AS value_sum
      |FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id
      | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
      |GROUP BY 1""".stripMargin

  /** Bloom-filter file skipping ([[graft.lake.BloomSkip]]): point lookups
    * on a high-cardinality key the layout is NOT clustered by. The table
    * is written hash-spread on o_orderkey (every file's [min,max] spans
    * the whole key domain — min/max manifests prune nothing), a sparse
    * per-file bloom manifest is derived from the written files, and a
    * small deterministic key batch is read back through bloom-candidate
    * files only, with an exact semi-join removing false positives. The
    * oracle replays the same lookup on the source table directly —
    * equality proves pruning never loses a row (no false negatives by
    * construction). BloomSkipSpec pins the pruning itself (candidates ≪
    * total files).
    */
  def q202BloomSkipping(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_q202_${math.abs(dir.hashCode)}"
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"),
      col("o_orderstatus"))
    graft.lake.BloomSkip.writeWithBloom(o, root, "o_orderkey", numFiles = 16)
    // fixed-size probe batch (the point-lookup shape): 8 deterministic keys
    val keys = o.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(8)
    graft.lake.BloomSkip.readPoints(s, root, "o_orderkey", keys)
  }

  val q202Sql: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, o_orderstatus
      |FROM orders
      |WHERE o_orderkey IN (SELECT o_orderkey FROM orders
      |  WHERE o_orderkey % 10 = 7 ORDER BY o_orderkey LIMIT 8)""".stripMargin

  /** Left-OUTER watermarked stream-stream interval join — the missing half
    * of q71: unmatched left rows only surface when the watermark passes
    * their join window (state eviction), so correctness depends on
    * watermark ADVANCE, not just on matching. Views pair with the same
    * user's purchases within 12 h; a view with no such purchase must still
    * be emitted with nulls.
    *
    * Protocol: the staging dir is written in two phases — the real events
    * first, then one sentinel view+purchase pair (user −1, never matches)
    * 14 days after the real max ts, in a later-mod-time file. With
    * maxFilesPerTrigger = 8 the real data is micro-batch 1 (watermark
    * still at its initial floor — nothing dropped despite unordered
    * files), the sentinel batch then pushes the watermark past every real
    * view's window, and the closing no-data batch evicts + emits all
    * unmatched views. Output is therefore batch-boundary-independent and
    * equals the batch LEFT JOIN oracle exactly.
    */
  /** Events staged for the outer stream-stream joins (q203/q206): the real
    * events as 8 files, then one sentinel view+purchase pair (user −1,
    * never matching a real row) 14 days after the real max ts in a
    * later-mod-time file — with maxFilesPerTrigger = 8 the sentinel batch
    * pushes the watermark past every real window and the closing no-data
    * batch evicts + emits all unmatched state. Staged once per (JVM, sf).
    */
  private def stageEventsWithSentinels(ev: DataFrame, dir: String): String = {
    val src = s"/tmp/graft_stage_ssoj_${math.abs(dir.hashCode)}"
    if (staged.add(src)) {
      try {
        ev.repartition(8).write.mode("overwrite").parquet(src)
        val gm = ev.agg(max(col("ts")).as("m"))
        gm.select(lit(-1L).as("event_id"),
            (col("m") + expr("INTERVAL 14 DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit("view").as("event_type"),
            lit(0.0).as("value"))
          .unionByName(gm.select(lit(-2L).as("event_id"),
            (col("m") + expr("INTERVAL 14 DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit("purchase").as("event_type"),
            lit(0.0).as("value")))
          .coalesce(1).write.mode("append").parquet(src)
      } catch { case e: Throwable => staged.remove(src); throw e }
    }
    src
  }

  /** views ⋈ buys on (user, 12 h interval) with 1 h watermarks — the shared
    * core of q203 (left_outer) and q206 (full_outer).
    */
  private def streamIntervalJoin(s: SparkSession, dir: String,
      joinType: String, queryName: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val src = stageEventsWithSentinels(ev, dir)
    Incremental.runAvailableNowScoped(s, { ss =>
      val stream = Incremental.fileStream(ss, src, ev.schema,
        maxFilesPerTrigger = Some(8))
      val views = stream.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
        .withWatermark("view_ts", "1 hour")
      val buys = stream.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("buy_ts"),
          col("user_id").as("b_user"), col("value").as("buy_value"))
        .withWatermark("buy_ts", "1 hour")
      views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 12 HOURS"),
        joinType)
    }, queryName, outputMode = "append", statePartitions = 8)
  }

  def q203StreamOuterJoin(s: SparkSession, dir: String): DataFrame =
    streamIntervalJoin(s, dir, "left_outer", "graft_q203_out")
      .filter(col("user_id") >= 0) // drop the sentinel's own rows
      .select(col("view_id"), col("user_id"), col("purchase_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("lag_us"),
        round(col("buy_value") * 100).cast("long").as("buy_cents"))

  /** FULL-outer watermarked stream-stream interval join — q203's protocol
    * with eviction emitting BOTH sides' unmatched state: a purchase with
    * no qualifying view in the 12 h window before it must surface with
    * null view columns once the watermark passes its window, alongside
    * q203's unmatched views. The sentinel filter keys on
    * coalesce(user, b_user): either side's columns may be null now.
    * Output ≡ the batch FULL JOIN oracle (batch-boundary-independent by
    * the sentinel protocol).
    */
  def q206StreamFullOuterJoin(s: SparkSession, dir: String): DataFrame =
    streamIntervalJoin(s, dir, "full_outer", "graft_q206_out")
      .filter(coalesce(col("user_id"), col("b_user")) >= 0)
      .select(col("view_id"),
        coalesce(col("user_id"), col("b_user")).as("user_key"),
        col("purchase_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("lag_us"),
        round(col("buy_value") * 100).cast("long").as("buy_cents"))

  val q206Sql: String =
    """SELECT a.event_id AS view_id,
      |  coalesce(a.user_id, b.user_id) AS user_key,
      |  b.event_id AS purchase_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS lag_us,
      |  CAST(round(b.value*100) AS BIGINT) AS buy_cents
      |FROM (SELECT * FROM events WHERE event_type = 'view') a
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 12 HOUR""".stripMargin

  val q203Sql: String =
    """SELECT a.event_id AS view_id, a.user_id, b.event_id AS purchase_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS lag_us,
      |  CAST(round(b.value*100) AS BIGINT) AS buy_cents
      |FROM (SELECT * FROM events WHERE event_type = 'view') a
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 12 HOUR""".stripMargin

  /** ORC sink + source round-trip (the one mainstream columnar format the
    * engine didn't yet exercise): write the part dimension as typed ORC
    * (numerics integerized to cents so the trip is value-preserving by
    * construction), read it back with a pushed prefix predicate, aggregate.
    * The oracle replays the cents math on the parquet table directly —
    * equality proves the ORC trip lost nothing.
    */
  def q84OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = "/tmp/graft_orc_part"
    Tables.part(s, dir)
      .select(col("p_partkey").cast("long").as("p_partkey"), col("p_brand"),
        col("p_type"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .filter(col("p_type").startsWith("ECONOMY"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("price_cents")).as("price_cents_sum"))
  }

  val q84Sql: String =
    """SELECT p_brand, count(*) AS n_parts,
      |  CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS price_cents_sum
      |FROM part WHERE p_type LIKE 'ECONOMY%'
      |GROUP BY 1""".stripMargin

  /** Snapshot time travel ([[graft.lake.Snapshots]]): commit the supplier
    * dimension (v1), commit a dynamic-overwrite patch doubling nation 3's
    * balances (v2), then aggregate BOTH versions from their manifests —
    * proving v1 still reads exactly as committed after the overwrite. The
    * oracle recomputes both versions from the source table.
    */
  def q89TimeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = "/tmp/graft_snap"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), s.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(root), true)
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey").cast("long").as("s_suppkey"),
      round(col("s_acctbal") * 100).cast("long").as("bal_cents"),
      col("s_nationkey").cast("int").as("nation"))
    graft.lake.Snapshots.commit(sup, root, "suppliers", Seq("nation"))
    graft.lake.Snapshots.commit(
      sup.filter(col("nation") === 3)
        .withColumn("bal_cents", col("bal_cents") * 2),
      root, "suppliers", Seq("nation"))
    val v1 = graft.lake.Snapshots.readVersion(s, root, "suppliers", 1L)
    val v2 = graft.lake.Snapshots.readVersion(s, root, "suppliers", 2L)
    v1.withColumn("version", lit(1)).unionByName(v2.withColumn("version", lit(2)))
      .filter(col("nation").isin(3, 7))
      .groupBy(col("version"), col("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("bal_cents")).as("bal_cents_sum"))
  }

  val q89Sql: String =
    """WITH s AS (SELECT CAST(s_nationkey AS INT) AS nation,
      |    CAST(round(s_acctbal*100) AS BIGINT) AS bal
      |  FROM supplier WHERE CAST(s_nationkey AS INT) IN (3, 7))
      |SELECT 1 AS version, nation, count(*) AS n_suppliers,
      |  CAST(sum(bal) AS BIGINT) AS bal_cents_sum FROM s GROUP BY 2
      |UNION ALL
      |SELECT 2 AS version, nation, count(*) AS n_suppliers,
      |  CAST(sum(CASE WHEN nation = 3 THEN bal * 2 ELSE bal END) AS BIGINT)
      |    AS bal_cents_sum FROM s GROUP BY 2""".stripMargin

  /** Change-data-feed diff between snapshot versions: same two commits as
    * q89 on an independent root, then [[graft.lake.Snapshots.diff]] v1→v2 —
    * nation 3's suppliers surface as delete(old balance) + insert(doubled),
    * every other row silent. The oracle recomputes both versions and takes
    * the same EXCEPT ALL multiset diff.
    */
  def q90SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val root = "/tmp/graft_snap_cdc"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), s.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(root), true)
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey").cast("long").as("s_suppkey"),
      round(col("s_acctbal") * 100).cast("long").as("bal_cents"),
      col("s_nationkey").cast("int").as("nation"))
    graft.lake.Snapshots.commit(sup, root, "suppliers", Seq("nation"))
    graft.lake.Snapshots.commit(
      sup.filter(col("nation") === 3)
        .withColumn("bal_cents", col("bal_cents") * 2),
      root, "suppliers", Seq("nation"))
    graft.lake.Snapshots.diff(s, root, "suppliers", 1L, 2L)
  }

  val q90Sql: String =
    """WITH s AS (SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
      |    CAST(round(s_acctbal*100) AS BIGINT) AS bal_cents,
      |    CAST(s_nationkey AS INT) AS nation FROM supplier),
      |v2 AS (SELECT s_suppkey,
      |    CASE WHEN nation = 3 THEN bal_cents * 2 ELSE bal_cents END AS bal_cents,
      |    nation FROM s)
      |SELECT *, 'insert' AS change_type FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM s)
      |UNION ALL
      |SELECT *, 'delete' AS change_type FROM (SELECT * FROM s EXCEPT ALL SELECT * FROM v2)""".stripMargin

  /** Streaming dedup with bounded state — `dropDuplicatesWithinWatermark`:
    * duplicates whose event times differ (retransmits, clock-skewed
    * producers) collapse as long as they arrive within the watermark
    * delay of each other, and state is EVICTED past the watermark instead
    * of growing with the corpus (the classic `dropDuplicates` would pin
    * every key forever — the 100 TB state-store killer).
    *
    * Protocol: micro-batch 1 = every event PLUS a same-batch retransmit
    * of the %7 keys at ts+5 min (collapses in-batch); micro-batch 2
    * (later-mod-time file) = retransmits of the freshest keys
    * (ts > max−1 h) at ts+10 min — their state is still live and they are
    * not late, so they dedup against batch 1 — plus genuinely new rows
    * (event_id+10⁹, ts+20 min) proving batch 2 was processed, not
    * skipped. Event time is deliberately NOT in the output: WHICH copy of
    * a duplicate wins is scan-order-dependent, but every other column is
    * identical across copies, so the output is deterministic. Oracle =
    * each event once + the synthetic new rows once.
    */
  def q207DedupWithinWatermark(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val src = s"/tmp/graft_stage_ddww_${math.abs(dir.hashCode)}"
    if (staged.add(src)) {
      try {
        ev.unionByName(ev.filter(col("event_id") % 7 === 0)
            .withColumn("ts", col("ts") + expr("INTERVAL 5 MINUTES")))
          .repartition(6).write.mode("overwrite").parquet(src)
        val gm = ev.agg(max(col("ts")).as("m"))
        // freshest keys: state still live when batch 2 runs (see scaladoc)
        val near = ev.join(broadcast(gm),
          col("ts") > col("m") - expr("INTERVAL 1 HOUR")).drop("m")
        near.withColumn("ts", col("ts") + expr("INTERVAL 10 MINUTES"))
          .unionByName(near.select(
            (col("event_id") + 1000000000L).as("event_id"),
            (col("ts") + expr("INTERVAL 20 MINUTES")).as("ts"),
            col("user_id"), col("event_type"), col("value")))
          .coalesce(1).write.mode("append").parquet(src)
      } catch { case e: Throwable => staged.remove(src); throw e }
    }
    Incremental.runAvailableNowScoped(s, { ss =>
      Incremental.fileStream(ss, src, ev.schema, maxFilesPerTrigger = Some(6))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
    }, "graft_q207_out", outputMode = "append", statePartitions = 8)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
  }

  val q207Sql: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(round(value*100) AS BIGINT) AS value_cents FROM events
      |UNION ALL
      |SELECT event_id + 1000000000, user_id, event_type,
      |  CAST(round(value*100) AS BIGINT)
      |FROM events
      |WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 1 HOUR""".stripMargin

  /** Stats-sidecar data skipping on the versioned lake
    * ([[graft.lake.Snapshots]] `statsCols`/`readVersionPruned`/`compact`):
    * commit the even-id half of events range-clustered WITH per-file
    * event_id stats (v1), append the odd half WITHOUT statsCols — its v1
    * stats must carry forward while the new files read conservatively
    * (v2), then [[graft.lake.Snapshots.compact]] the live set into fresh
    * range-clustered files with fresh stats (v3). A pruned range read of
    * each version aggregates identically to the oracle's recompute from
    * the source table — time travel, carry-forward, and post-compaction
    * all skip on exactly the stats committed WITH that version's file
    * list, so nothing can go stale. SnapshotsSpec pins the actual
    * file-count reductions; this gate pins result equivalence.
    *
    * Scale: the sidecar is one row per FILE (at 100 TB with 1 GB files,
    * ~10⁵ rows — broadcast/driver-sized by construction); pruning cost is
    * a sidecar scan, never a data scan.
    */
  /** q204/q209's shared snapshot history, staged once per (JVM, sf):
    * v1 = even-id events range-clustered WITH event_id stats, v2 = odd
    * half appended WITHOUT statsCols (carry-forward), v3 = compacted with
    * fresh stats. Versions 1-3 are deterministic; re-commits would only
    * grow the history past what the gates read. Dir-keyed root:
    * concurrent JVMs must not race on a shared path.
    */
  private def stageSnapshotHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_snapstats_${math.abs(dir.hashCode)}"
    import graft.lake.Snapshots
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))
        Snapshots.commit(
          ev.filter(col("event_id") % 2 === 0).repartitionByRange(8, col("event_id")),
          root, "events", Seq.empty, statsCols = Seq("event_id"))
        Snapshots.commit(
          ev.filter(col("event_id") % 2 === 1).repartitionByRange(8, col("event_id")),
          root, "events", Seq.empty) // no statsCols: exercises carry-forward
        Snapshots.compact(s, root, "events", Seq.empty, numFiles = 8,
          clusterCols = Seq("event_id"), statsCols = Seq("event_id"))
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  def q204SnapshotStatsPrune(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val root = stageSnapshotHistory(s, dir)
    val (lo, hi) = (lit(100L), lit(2000L))
    Seq(1L, 2L, 3L).map { v =>
      Snapshots.readVersionPruned(s, root, "events", v, "event_id", lo, hi)
        .groupBy().agg(count(lit(1)).as("n_rows"),
          sum(col("value_cents")).as("value_cents_sum"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .withColumn("version", lit(v))
    }.reduce(_.unionByName(_))
      .select("version", "n_rows", "value_cents_sum", "min_id", "max_id")
  }

  val q204Sql: String =
    """WITH r AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS vc
      |           FROM events WHERE event_id BETWEEN 100 AND 2000)
      |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
      |  CAST(sum(vc) AS BIGINT) AS value_cents_sum,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM r WHERE event_id % 2 = 0
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT),
      |  min(event_id), max(event_id) FROM r
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT),
      |  min(event_id), max(event_id) FROM r""".stripMargin

  /** SQL time travel over the versioned lake ([[graft.sql.GraftCatalog]]
    * × [[graft.lake.Snapshots]]): the q204 history queried as PURE SQL —
    * `VERSION AS OF 1` must see only the even half, `VERSION AS OF 2`
    * everything, and the bare identifier must resolve the LATEST
    * (post-compaction) manifest, never the raw data directory, whose
    * superseded v1/v2 files would double-count every row. The oracle
    * recomputes each version's aggregate from the source table.
    */
  def q209SqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = stageSnapshotHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftsnap", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
             sum(value_cents) AS value_cents_sum
      FROM graftsnap.events VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(value_cents)
      FROM graftsnap.events VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(value_cents)
      FROM graftsnap.events""")
  }

  val q209Sql: String =
    """WITH ev AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS vc
      |            FROM events)
      |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
      |  CAST(sum(vc) AS BIGINT) AS value_cents_sum
      |FROM ev WHERE event_id % 2 = 0
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT) FROM ev
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT) FROM ev""".stripMargin

  /** Stats-sidecar data skipping reachable from PURE SQL
    * ([[graft.sql.SidecarSkip]] × [[graft.sql.GraftCatalog]]): the q204
    * history re-queried through the catalog — the same `event_id BETWEEN`
    * range over `VERSION AS OF 1/2/3` must aggregate identically to the
    * oracle's recompute, with the scan consulting each version's
    * `stats_v<N>` sidecar so the SQL read opens the same candidate file
    * set `readVersionPruned` does (GraftCatalogSpec pins the opened-file
    * equality; this gate pins result equivalence). Closes the two-read-
    * APIs gap: before this, only the Scala path skipped files.
    */
  def q210SqlStatsPrune(s: SparkSession, dir: String): DataFrame = {
    val root = stageSnapshotHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftsnap", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
             sum(value_cents) AS value_cents_sum,
             min(event_id) AS min_id, max(event_id) AS max_id
      FROM graftsnap.events VERSION AS OF 1
      WHERE event_id BETWEEN 100 AND 2000
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(value_cents),
             min(event_id), max(event_id)
      FROM graftsnap.events VERSION AS OF 2
      WHERE event_id BETWEEN 100 AND 2000
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(value_cents),
             min(event_id), max(event_id)
      FROM graftsnap.events VERSION AS OF 3
      WHERE event_id BETWEEN 100 AND 2000""")
  }

  // same recompute as q204: the SQL path must agree with the Scala path
  val q210Sql: String = q204Sql

  /** q211's versioned history with a PURE-SQL append: v1 = even-id events
    * committed from Scala WITH event_id stats, v2 = the odd half appended
    * via `INSERT INTO` through the catalog ([[graft.sql
    * .SnapshotInsertTable]] → [[graft.lake.Snapshots.append]]). Staged
    * once per (JVM, sf); both versions are deterministic. Dir-keyed root
    * per the concurrent-JVM invariant.
    */
  private def stageSqlInsertHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlins_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))
        graft.lake.Snapshots.commit(
          ev.filter(col("event_id") % 2 === 0).repartitionByRange(8, col("event_id")),
          root, "events", Seq.empty, statsCols = Seq("event_id"))
        graft.sql.GraftCatalog.install(s, "graftins", root)
        ev.filter(col("event_id") % 2 === 1)
          .createOrReplaceTempView("graft_q211_src")
        s.sql("""INSERT INTO graftins.events
                 SELECT event_id, value_cents FROM graft_q211_src""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL write path over the versioned lake: an `INSERT INTO` through the
    * catalog must land as a first-class snapshot commit — version 2's
    * reads (bare and `VERSION AS OF`) see base + inserted rows exactly
    * once, version 1 stays intact, and the appended files carry event_id
    * stats (the previous sidecar's columns), so a post-insert SQL range
    * read still data-skips (leg 3; GraftCatalogSpec pins the file-count
    * mechanics, this gate pins result equivalence against the source
    * recompute).
    */
  def q211SqlInsert(s: SparkSession, dir: String): DataFrame = {
    val root = stageSqlInsertHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftins", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(value_cents) AS value_cents_sum
      FROM graftins.events VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(value_cents)
      FROM graftins.events
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(value_cents)
      FROM graftins.events VERSION AS OF 2
      WHERE event_id BETWEEN 100 AND 2000""")
  }

  val q211Sql: String =
    """WITH ev AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS vc
      |            FROM events)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(vc) AS BIGINT) AS value_cents_sum
      |FROM ev WHERE event_id % 2 = 0
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT) FROM ev
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT)
      |FROM ev WHERE event_id BETWEEN 100 AND 2000""".stripMargin

  /** q213's evolving snapshot history, staged once per (JVM, sf): v1 =
    * even-id events (event_id, value_cents) with event_id stats; v2 = the
    * odd half APPENDED with a new `bucket` column (additive schema
    * evolution — `Snapshots.append`, since an unpartitioned commit would
    * dynamically overwrite everything). Dir-keyed root per the
    * concurrent-JVM invariant.
    */
  private def stageEvoHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_snapevo_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))
        graft.lake.Snapshots.commit(
          ev.filter(col("event_id") % 2 === 0).repartitionByRange(4, col("event_id")),
          root, "events", Seq.empty, statsCols = Seq("event_id"))
        graft.lake.Snapshots.append(
          ev.filter(col("event_id") % 2 === 1)
            .withColumn("bucket", col("event_id") % 10)
            .repartitionByRange(4, col("event_id")),
          root, "events", Seq.empty)
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** Snapshot schema evolution, end to end: the manifest carries each
    * version's schema, so v1 reads WITHOUT the later `bucket` column (the
    * -1 sentinels pin its absence — a leaked column would count 0, not
    * -1), v2 reads the merged schema with pre-`bucket` files as null, and
    * the catalog SQL read (leg 3) resolves the same merged schema.
    * SnapshotsSpec pins column sets, type-change refusal, partial-column
    * appends, diff alignment, and compaction carry-forward; this gate
    * pins VALUE correctness against the source recompute.
    */
  def q213SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = stageEvoHistory(s, dir)
    import graft.lake.Snapshots
    def agg(df: DataFrame, leg: Long): DataFrame = {
      val (nb, bs) =
        if (df.columns.contains("bucket"))
          (count(col("bucket")), sum(col("bucket")))
        else (lit(-1L), lit(-1L)) // pins that the column does NOT exist
      df.groupBy().agg(count(lit(1)).as("n_rows"),
          sum(col("value_cents")).as("value_cents_sum"),
          nb.cast("long").as("n_bucket"), bs.cast("long").as("bucket_sum"))
        .withColumn("leg", lit(leg))
    }
    val leg1 = agg(Snapshots.readVersion(s, root, "events", 1L), 1L)
    val leg2 = agg(Snapshots.readVersion(s, root, "events", 2L), 2L)
    graft.sql.GraftCatalog.install(s, "graftevo", root)
    val leg3 = s.sql("""
      SELECT count(*) AS n_rows, sum(value_cents) AS value_cents_sum,
             count(bucket) AS n_bucket, sum(bucket) AS bucket_sum
      FROM graftevo.events""").withColumn("leg", lit(3L))
    leg1.unionByName(leg2).unionByName(leg3)
      .select("leg", "n_rows", "value_cents_sum", "n_bucket", "bucket_sum")
  }

  val q213Sql: String =
    """WITH ev AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS vc
      |            FROM events)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(vc) AS BIGINT) AS value_cents_sum,
      |  CAST(-1 AS BIGINT) AS n_bucket, CAST(-1 AS BIGINT) AS bucket_sum
      |FROM ev WHERE event_id % 2 = 0
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT),
      |  count(*) FILTER (WHERE event_id % 2 = 1),
      |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN event_id % 10 END) AS BIGINT)
      |FROM ev
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT),
      |  count(*) FILTER (WHERE event_id % 2 = 1),
      |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN event_id % 10 END) AS BIGINT)
      |FROM ev""".stripMargin

  /** q218's delete-bearing history, staged once per (JVM, sf):
    * v1 = all events (8 range files, event_id stats); v2 = a PURE-SQL
    * `DELETE FROM … WHERE event_id BETWEEN 100 AND 2000` — a merge-on-read
    * manifest vector, no file rewritten; v3 = a PURE-SQL `INSERT INTO`
    * re-adding the deleted ids ≤ 500 (the addedAt sequence rule must
    * exempt the new file from the older vector); v4 = compaction folding
    * the vector away. Dir-keyed root per the concurrent-JVM invariant.
    */
  /** q232's general-DELETE history, staged once per (JVM, sf): v1 = all
    * events; v2 = a DELETE whose predicate the V2 filter language cannot
    * express (`event_id % 7 = 3` — evaluated via
    * [[graft.sql.SnapshotDeleteCommand]] → `Snapshots.deleteWhereBound`,
    * still a merge-on-read vector); v3 = a DELETE whose predicate carries
    * an IN SUBQUERY over the table's own current state (inlined once at
    * run time — it sees v2, i.e. post-first-delete rows only).
    */
  private def stageGeneralDeleteHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqldel2_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))
        graft.lake.Snapshots.commit(
          ev.repartitionByRange(8, col("event_id")),
          root, "events", Seq.empty, statsCols = Seq("event_id"))
        graft.sql.GraftCatalog.install(s, "graftdel2", root)
        s.sql("DELETE FROM graftdel2.events WHERE event_id % 7 = 3")
        s.sql("""DELETE FROM graftdel2.events
                 WHERE event_id IN (SELECT event_id FROM graftdel2.events
                                    WHERE value_cents % 1000 = 7)""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** Generalized SQL DELETE (round 16): evaluated predicates beyond the
    * V2 filter language and inlined uncorrelated subqueries, both still
    * merge-on-read vectors through the same protocol. Leg 1 = pre-delete;
    * leg 2 = post modulo-delete; leg 3 = post subquery-delete (the
    * subquery saw v2). The oracle recomputes all three from events.
    */
  def q232GeneralDelete(s: SparkSession, dir: String): DataFrame = {
    val root = stageGeneralDeleteHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftdel2", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(value_cents) AS value_cents_sum
      FROM graftdel2.events VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(value_cents)
      FROM graftdel2.events VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(value_cents)
      FROM graftdel2.events""")
  }

  val q232Sql: String =
    """WITH ev AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS vc
      |            FROM events),
      |v2 AS (SELECT * FROM ev WHERE event_id % 7 <> 3),
      |v3 AS (SELECT * FROM v2 WHERE vc % 1000 <> 7)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(vc) AS BIGINT) AS value_cents_sum FROM ev
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT) FROM v2
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT) FROM v3""".stripMargin

  private def stageSqlDeleteHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqldel_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))
        graft.lake.Snapshots.commit(
          ev.repartitionByRange(8, col("event_id")),
          root, "events", Seq.empty, statsCols = Seq("event_id"))
        graft.sql.GraftCatalog.install(s, "graftdel", root)
        s.sql("DELETE FROM graftdel.events WHERE event_id BETWEEN 100 AND 2000")
        ev.filter(col("event_id").between(100, 500))
          .createOrReplaceTempView("graft_q218_src")
        s.sql("""INSERT INTO graftdel.events
                 SELECT event_id, value_cents FROM graft_q218_src""")
        graft.lake.Snapshots.compact(s, root, "events", Seq.empty,
          numFiles = 4, clusterCols = Seq("event_id"),
          statsCols = Seq("event_id"))
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL row-level DELETE through the snapshot commit protocol
    * ([[graft.sql.SnapshotDmlTable]] → `Snapshots.deleteWhere`,
    * merge-on-read): leg 1 = the pre-delete version still reads the full
    * set; leg 2 = the delete-bearing version read as PURE SQL (the scan
    * applies the manifest vector in its readers — [[graft.sql.MorRead]]);
    * leg 3 = after a SQL re-INSERT of the ids ≤ 500, the new file is
    * exempt from the older vector (sequence rule); leg 4 = the
    * post-compact read — must equal leg 3's aggregate exactly (MOR read ≡
    * compacted read; the oracle pins both against the source recompute).
    */
  def q218SqlDelete(s: SparkSession, dir: String): DataFrame = {
    val root = stageSqlDeleteHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftdel", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(value_cents) AS value_cents_sum
      FROM graftdel.events VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(value_cents)
      FROM graftdel.events VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(value_cents)
      FROM graftdel.events VERSION AS OF 3
      UNION ALL
      SELECT CAST(4 AS BIGINT), count(*), sum(value_cents)
      FROM graftdel.events""")
  }

  val q218Sql: String =
    """WITH ev AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS vc
      |            FROM events),
      |surv AS (SELECT * FROM ev WHERE event_id NOT BETWEEN 100 AND 2000),
      |reins AS (SELECT * FROM ev WHERE event_id BETWEEN 100 AND 500)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(vc) AS BIGINT) AS value_cents_sum FROM ev
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT) FROM surv
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT)
      |FROM (SELECT * FROM surv UNION ALL SELECT * FROM reins)
      |UNION ALL
      |SELECT CAST(4 AS BIGINT), count(*), CAST(sum(vc) AS BIGINT)
      |FROM (SELECT * FROM surv UNION ALL SELECT * FROM reins)""".stripMargin

  /** q219's MERGE history, staged once per (JVM, sf): v1 = customers with
    * `c_custkey % 7 != 0` (so the ops log has genuine NOT-MATCHED rows),
    * bucketed by `pb = c_custkey % 10`; then the SAME `MERGE INTO` runs
    * TWICE through pure SQL (idempotency is part of the gate): the orders
    * log deduped to last-writer-wins per custkey (ANSI MERGE refuses dup
    * source keys), status 'F' deletes, anything else upserts the latest
    * price in cents, unmatched NON-delete ops insert (the conditioned
    * NOT MATCHED clause — a delete of a never-present key is ignored, per
    * ANSI first-match routing). Partition-pruned copy-on-write: only
    * touched `pb=` partitions are replaced per run.
    */
  private def stageSqlMergeHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlmrg_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir)
          .filter(col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "balances", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftmrg", root)
        Tables.orders(s, dir).select(
            col("o_custkey").as("ck"), col("o_orderdate"), col("o_orderkey"),
            when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("graft_q219_ops")
        val merge =
          """MERGE INTO graftmrg.balances AS tgt
            |USING (SELECT * FROM (
            |         SELECT ck, op, cents, row_number() OVER (
            |           PARTITION BY ck
            |           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            |         FROM graft_q219_ops) WHERE rn = 1) AS src
            |ON tgt.c_custkey = src.ck
            |WHEN MATCHED AND src.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET bal_cents = src.cents
            |WHEN NOT MATCHED AND src.op <> 'D' THEN INSERT
            |  (c_custkey, bal_cents, pb) VALUES (src.ck, src.cents, src.ck % 10)""".stripMargin
        s.sql(merge)
        s.sql(merge) // idempotent re-run: new version, same end state
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL MERGE INTO as the CDC verb ([[graft.sql.SnapshotMergeRule]] →
    * [[graft.operators.Cdc.merge]] → partition-pruned snapshot commit; the
    * reference's daily update restated as one statement —
    * update/app.py:877-940's anti-join append, publishers.py:270-288's
    * replace-year). Leg 1 pins the pre-merge base; legs 2 and 3 read the
    * first and second MERGE's versions — both must equal the oracle's
    * last-writer-wins recompute (idempotent re-run), deletes dropped,
    * unmatched ops inserted, untouched customers carried over.
    */
  def q219SqlMerge(s: SparkSession, dir: String): DataFrame = {
    val root = stageSqlMergeHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftmrg", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum
      FROM graftmrg.balances VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM graftmrg.balances VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM graftmrg.balances""")
  }

  /** q221's general-MERGE history, staged once per (JVM, sf): v1 =
    * customers with `c_custkey % 7 != 0` bucketed by `pb`; one MERGE
    * exercising the FULL ANSI clause surface the engine supports —
    * first-match routing across two conditioned UPDATEs (the first reads
    * the TARGET side: the accumulating `bal = tgt.bal + src.delta`
    * upsert), and a CONDITIONED INSERT (small sources are ignored, per
    * first-match NOT MATCHED routing). The source is an aggregation, so
    * dup keys are impossible by construction.
    */
  private def stageSqlMerge2History(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlmrg2_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir)
          .filter(col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "balances", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftmrg2", root)
        Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("delta"),
            count(lit(1)).as("n"))
          .createOrReplaceTempView("graft_q221_ops")
        s.sql("""MERGE INTO graftmrg2.balances AS tgt
                 USING graft_q221_ops AS src ON tgt.c_custkey = src.ck
                 WHEN MATCHED AND src.n >= 10 THEN
                   UPDATE SET bal_cents = tgt.bal_cents + src.delta
                 WHEN MATCHED THEN UPDATE SET bal_cents = src.delta
                 WHEN NOT MATCHED AND src.n >= 2 THEN INSERT
                   (c_custkey, bal_cents, pb) VALUES (src.ck, src.delta, src.ck % 10)""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL MERGE, general ANSI clause routing ([[graft.sql.SnapshotMergeRule]]):
    * the accumulating target-reading upsert (`SET bal = tgt.bal +
    * src.delta` for high-volume customers), a second UPDATE clause taking
    * the first's leftovers (first-match wins), and a conditioned INSERT
    * ignoring unmatched single-order customers. Leg 1 pins the pre-merge
    * base; leg 2 the merged state — the oracle replays the clause routing
    * as one CASE over a full outer join.
    */
  def q221SqlMergeGeneral(s: SparkSession, dir: String): DataFrame = {
    val root = stageSqlMerge2History(s, dir)
    graft.sql.GraftCatalog.install(s, "graftmrg2", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum
      FROM graftmrg2.balances VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM graftmrg2.balances""")
  }

  val q221Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |ops AS (SELECT o_custkey AS ck,
      |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS delta,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |merged AS (
      |  SELECT COALESCE(b.c_custkey, o.ck) AS k,
      |    CASE WHEN b.c_custkey IS NOT NULL AND o.ck IS NOT NULL AND o.n >= 10
      |           THEN b.bal + o.delta
      |         WHEN b.c_custkey IS NOT NULL AND o.ck IS NOT NULL THEN o.delta
      |         WHEN b.c_custkey IS NOT NULL THEN b.bal
      |         ELSE o.delta END AS bal,
      |    (b.c_custkey IS NOT NULL OR o.n >= 2) AS keep
      |  FROM base b FULL OUTER JOIN ops o ON b.c_custkey = o.ck)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM merged WHERE keep""".stripMargin

  /** q222's UPDATE history, staged once per (JVM, sf): v1 = all customers
    * bucketed by `pb`; v2 = a conditioned, TARGET-READING pure-SQL UPDATE
    * (`SET bal_cents = bal_cents + c_custkey % 100 WHERE pb = 3` —
    * partition-pruned to the one touched bucket); v3 = an unconditioned
    * UPDATE negating every balance (whole-table rewrite).
    */
  private def stageSqlUpdateHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_squpd_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "balances", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftupd", root)
        s.sql("""UPDATE graftupd.balances
                 SET bal_cents = bal_cents + c_custkey % 100 WHERE pb = 3""")
        s.sql("UPDATE graftupd.balances SET bal_cents = -bal_cents")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL UPDATE through the snapshot commit protocol
    * ([[graft.sql.SnapshotUpdateRule]] → conditional projection →
    * partition-pruned, base-pinned commit): leg 1 = the pre-update version
    * intact (time travel); leg 2 = the conditioned target-reading UPDATE
    * (only `pb = 3` rows moved, only that partition was replaced); leg 3 =
    * the unconditioned whole-table UPDATE. The oracle recomputes every leg
    * from the source table.
    */
  def q222SqlUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = stageSqlUpdateHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftupd", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum
      FROM graftupd.balances VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM graftupd.balances VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM graftupd.balances""")
  }

  val q222Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal,
      |    c_custkey % 10 AS pb
      |  FROM customer),
      |v2 AS (SELECT c_custkey,
      |    bal + CASE WHEN pb = 3 THEN c_custkey % 100 ELSE 0 END AS bal
      |  FROM base)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(c_custkey) AS BIGINT) FROM v2
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(-bal) AS BIGINT),
      |  CAST(sum(c_custkey) AS BIGINT) FROM v2""".stripMargin

  /** q223's CDF history + one AvailableNow stream pass, staged once per
    * (JVM, sf): v1/v2/v4 = unpartitioned commits (append semantics — no
    * file ever removed, the CDF-exact shape) slicing events by
    * `event_id % 3`; v3 = a merge-on-read `deleteWhere` over a key range
    * (a manifest vector, streamed as key-level delete rows). The stream
    * ([[graft.sql.CdfSource]]) writes its change rows to a parquet sink
    * with a persistent checkpoint, so a re-invocation consumes nothing new
    * and the sink is stable (resume is additionally pinned in
    * CdfSourceSpec).
    */
  private def stageCdfStreamHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_cdfstream_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))
        def slice(r: Int) = ev.filter(col("event_id") % 3 === r)
        graft.lake.Snapshots.commit(slice(0), root, "events", Seq.empty)
        graft.lake.Snapshots.commit(slice(1), root, "events", Seq.empty)
        graft.lake.Snapshots.deleteWhere(s, root, "events",
          col("event_id").between(100, 500))
        graft.lake.Snapshots.commit(slice(2), root, "events", Seq.empty)
        val q = s.readStream.format(classOf[graft.sql.CdfSource].getName)
          .option("root", root).option("table", "events").load()
          .writeStream.format("parquet")
          .option("path", s"$root/_cdf_out")
          .option("checkpointLocation", s"$root/_cdf_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** Change-data-feed streaming source over a versioned table
    * ([[graft.sql.CdfSource]] — version-number offsets, manifest `addedAt`
    * file attribution, vector-key delete rows): one per-(version,
    * change-type) aggregate row per micro-batch's worth of changes. The
    * oracle replays every leg from the source table, including the delete
    * rows (= the vector's distinct matching keys, value columns null).
    */
  def q223CdfStream(s: SparkSession, dir: String): DataFrame = {
    val root = stageCdfStreamHistory(s, dir)
    s.read.parquet(s"$root/_cdf_out")
      .groupBy(col("_commit_version").as("v"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value_cents")).as("vc_sum"))
  }

  val q223Sql: String =
    """WITH ev AS (SELECT event_id,
      |    CAST(round(value*100) AS BIGINT) AS vc FROM events)
      |SELECT CAST(1 AS BIGINT) AS v, 'insert' AS change_type,
      |  count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_sum,
      |  CAST(sum(vc) AS BIGINT) AS vc_sum
      |FROM ev WHERE event_id % 3 = 0
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'insert', count(*),
      |  CAST(sum(event_id) AS BIGINT), CAST(sum(vc) AS BIGINT)
      |FROM ev WHERE event_id % 3 = 1
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'delete', count(*),
      |  CAST(sum(event_id) AS BIGINT), CAST(NULL AS BIGINT)
      |FROM (SELECT DISTINCT event_id FROM ev
      |      WHERE event_id BETWEEN 100 AND 500 AND event_id % 3 IN (0, 1))
      |UNION ALL
      |SELECT CAST(4 AS BIGINT), 'insert', count(*),
      |  CAST(sum(event_id) AS BIGINT), CAST(sum(vc) AS BIGINT)
      |FROM ev WHERE event_id % 3 = 2""".stripMargin

  /** q224's four-verb history, staged once per (JVM, sf): v1 = a 2-file
    * commit, v2 = a 1-file commit (unpartitioned commits append), v3 = a
    * merge-on-read delete (vector only — zero files added or removed),
    * v4 = a single-file compact folding the vector away. File counts are
    * pinned by explicit repartitioning, so the whole history surface is
    * oracle-replayable.
    */
  private def stageHistoryGate(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_hist_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(col("event_id"))
        graft.lake.Snapshots.commit(
          ev.filter(col("event_id") % 5 === 0).repartition(2),
          root, "events", Seq.empty)
        graft.lake.Snapshots.commit(
          ev.filter(col("event_id") % 5 === 1).repartition(1),
          root, "events", Seq.empty)
        graft.lake.Snapshots.deleteWhere(s, root, "events",
          col("event_id") % 10 === 0)
        graft.lake.Snapshots.compact(s, root, "events", Seq.empty,
          numFiles = 1, clusterCols = Seq("event_id"))
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** DESCRIBE HISTORY ([[graft.lake.Snapshots.history]] — manifest-only
    * driver work: version, operation, live-file / delete-vector / added-
    * file counts), cross-checked against per-version SQL time-travel row
    * counts. The oracle replays both the structural columns (pinned by the
    * staged verbs) and the row counts (recomputed from the source table).
    */
  def q224History(s: SparkSession, dir: String): DataFrame = {
    val root = stageHistoryGate(s, dir)
    graft.sql.GraftCatalog.install(s, "grafthist", root)
    // the Iceberg-style SQL spelling of Snapshots.history: a LocalScan
    // metadata table resolved by the catalog (graft.sql.HistoryMetadataTable)
    val h = s.sql("""SELECT version, operation, n_files,
                     n_delete_vectors, n_added_files
                     FROM grafthist.events.history""")
    val counts = (1L to 4L).map(v => s.sql(
        s"""SELECT CAST($v AS BIGINT) AS version, count(*) AS n_rows
            FROM grafthist.events VERSION AS OF $v"""))
      .reduce(_.unionByName(_)) // four rows — version-count-sized
    h.join(counts, Seq("version"))
  }

  val q224Sql: String =
    """WITH a AS (SELECT event_id FROM events WHERE event_id % 5 = 0),
      |b AS (SELECT event_id FROM events WHERE event_id % 5 = 1),
      |d AS (SELECT event_id FROM a WHERE event_id % 10 = 0)
      |SELECT CAST(1 AS BIGINT) AS version, 'commit' AS operation,
      |  CAST(2 AS BIGINT) AS n_files, CAST(0 AS BIGINT) AS n_delete_vectors,
      |  CAST(2 AS BIGINT) AS n_added_files,
      |  (SELECT count(*) FROM a) AS n_rows
      |UNION ALL
      |SELECT 2, 'commit', 3, 0, 1,
      |  (SELECT count(*) FROM a) + (SELECT count(*) FROM b)
      |UNION ALL
      |SELECT 3, 'delete', 3, 1, 0,
      |  (SELECT count(*) FROM a) + (SELECT count(*) FROM b)
      |    - (SELECT count(*) FROM d)
      |UNION ALL
      |SELECT 4, 'compact', 1, 0, 1,
      |  (SELECT count(*) FROM a) + (SELECT count(*) FROM b)
      |    - (SELECT count(*) FROM d)""".stripMargin

  /** q225's truncate-and-recover lifecycle, staged once per (JVM, sf):
    * v1 = all customers; v2 = a PURE-SQL `DELETE FROM` (no WHERE) — a
    * zero-file truncate manifest; v3 = a PURE-SQL `INSERT INTO` re-seeding
    * a third of the keys (the write layout derives from the manifest alone
    * — no live file existed to infer it from); v4 = a PURE-SQL MERGE
    * upserting into the re-born table. Every statement runs through the
    * catalog — the truncated state must stay fully SQL-addressable.
    */
  private def stageTruncateHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_trunc_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "balances", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "grafttrunc", root)
        s.sql("DELETE FROM grafttrunc.balances")
        base.filter(col("c_custkey") % 3 === 0)
          .createOrReplaceTempView("graft_q225_reseed")
        s.sql("""INSERT INTO grafttrunc.balances
                 SELECT c_custkey, bal_cents, pb FROM graft_q225_reseed""")
        base.filter(col("c_custkey") % 3 <= 1)
          .select(col("c_custkey").as("ck"), col("bal_cents").as("bal"),
            col("pb"))
          .createOrReplaceTempView("graft_q225_src")
        s.sql("""MERGE INTO grafttrunc.balances AS tgt
                 USING graft_q225_src AS src ON tgt.c_custkey = src.ck
                 WHEN MATCHED THEN UPDATE SET bal_cents = tgt.bal_cents + 1
                 WHEN NOT MATCHED THEN INSERT (c_custkey, bal_cents, pb)
                   VALUES (src.ck, src.bal, src.pb)""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL truncate lifecycle: leg 1 = the pre-truncate version; leg 2 = the
    * ZERO-FILE truncated version read as pure SQL (a typed empty relation,
    * not an error); leg 3 = the SQL re-INSERT (write layout derived from
    * the manifest of an empty table); leg 4 = a MERGE upsert on the
    * re-born table. The oracle replays all four legs from the source.
    */
  def q225SqlTruncate(s: SparkSession, dir: String): DataFrame = {
    val root = stageTruncateHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "grafttrunc", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum
      FROM grafttrunc.balances VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM grafttrunc.balances VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM grafttrunc.balances VERSION AS OF 3
      UNION ALL
      SELECT CAST(4 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM grafttrunc.balances""")
  }

  val q225Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
      |  FROM customer),
      |re AS (SELECT * FROM base WHERE c_custkey % 3 = 0),
      |m AS (SELECT c_custkey, bal + 1 AS bal FROM re
      |      UNION ALL
      |      SELECT c_custkey, bal FROM base WHERE c_custkey % 3 = 1)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
      |  CAST(NULL AS BIGINT)
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(c_custkey) AS BIGINT) FROM re
      |UNION ALL
      |SELECT CAST(4 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(c_custkey) AS BIGINT) FROM m""".stripMargin

  /** q226's INSERT OVERWRITE lifecycle, staged once per (JVM, sf): v1 =
    * orders bucketed by `ob`; v2 = a STATIC `PARTITION (ob = 3)` spec
    * overwrite thinning that one bucket (explicit replaced prefix — no
    * other partition moves); v3 = a DYNAMIC-mode overwrite doubling
    * buckets 1 and 5 (partitions present in the frame replaced, the rest
    * carried — `Snapshots.commit` through the
    * [[graft.sql.SnapshotDynamicOverwriteCommand]] rewrite); v4 = a
    * static FULL overwrite (the frame IS the new version; the partition
    * layout survives in the manifest). All pure SQL.
    */
  private def stageInsertOverwriteHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_iow_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.orders(s, dir).select(
          col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          (col("o_orderkey") % 8).as("ob"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("o_orderkey")),
          root, "ord", Seq("ob"), statsCols = Seq("o_orderkey"))
        graft.sql.GraftCatalog.install(s, "graftiow", root)
        base.createOrReplaceTempView("graft_q226_src")
        s.sql("""INSERT OVERWRITE graftiow.ord PARTITION (ob = 3)
                 SELECT o_orderkey, cents FROM graft_q226_src
                 WHERE ob = 3 AND o_orderkey % 3 = 0""")
        val k = "spark.sql.sources.partitionOverwriteMode"
        val prev = s.conf.getOption(k)
        s.conf.set(k, "dynamic")
        try s.sql("""INSERT OVERWRITE graftiow.ord
                     SELECT o_orderkey, cents * 2 AS cents, ob
                     FROM graft_q226_src WHERE ob IN (1, 5)""")
        finally prev match {
          case Some(v) => s.conf.set(k, v)
          case None => s.conf.unset(k)
        }
        s.sql("""INSERT OVERWRITE graftiow.ord
                 SELECT o_orderkey, cents, ob FROM graft_q226_src
                 WHERE ob = 0""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL INSERT OVERWRITE in all three shapes (static PARTITION spec →
    * explicit replaced prefix; dynamic mode → `Snapshots.commit`; static
    * full → logical replace with the layout carried): each leg reads one
    * version of the staged history, every value oracle-recomputed.
    */
  def q226InsertOverwrite(s: SparkSession, dir: String): DataFrame = {
    val root = stageInsertOverwriteHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftiow", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(cents) AS cents_sum, sum(o_orderkey) AS key_sum
      FROM graftiow.ord VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(cents), sum(o_orderkey)
      FROM graftiow.ord VERSION AS OF 2
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), sum(cents), sum(o_orderkey)
      FROM graftiow.ord VERSION AS OF 3
      UNION ALL
      SELECT CAST(4 AS BIGINT), count(*), sum(cents), sum(o_orderkey)
      FROM graftiow.ord""")
  }

  val q226Sql: String =
    """WITH o AS (SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
      |    o_orderkey % 8 AS ob
      |  FROM orders),
      |v2 AS (SELECT * FROM o WHERE ob <> 3
      |       UNION ALL SELECT * FROM o WHERE ob = 3 AND k % 3 = 0),
      |v3 AS (SELECT * FROM v2 WHERE ob NOT IN (1, 5)
      |       UNION ALL SELECT k, cents * 2, ob FROM o WHERE ob IN (1, 5))
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS cents_sum,
      |  CAST(sum(k) AS BIGINT) AS key_sum FROM o
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(cents) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM v2
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(cents) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM v3
      |UNION ALL
      |SELECT CAST(4 AS BIGINT), count(*), CAST(sum(cents) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM o WHERE ob = 0""".stripMargin

  /** q227's BY SOURCE history, staged once per (JVM, sf): v1 = every
    * customer listed 'active'; ONE full-sync MERGE against "today's
    * snapshot" (customers with `c_custkey % 3 != 0`, re-priced, plus a
    * key-shifted newly-listed block) — matched rows re-price
    * conditionally, unmatched snapshot rows insert, and rows ABSENT from
    * the snapshot route through `WHEN NOT MATCHED BY SOURCE`: low
    * buckets hard-DELETE (first match), the rest soft-delist. This is
    * the reference's SCD-2 delist semantics (securities absent from
    * today's snapshot get end-dated, master/security_master.py:1198-1410)
    * as one ANSI statement ([[graft.sql.SnapshotMergeRule]]).
    */
  private def stageMergeBySourceHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlbs_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir).select(
          col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          lit("active").as("status"),
          (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "listings", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftbs", root)
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("cents"))
        cust.filter(col("c_custkey") % 3 =!= 0)
          .select(col("c_custkey").as("ck"), (col("cents") + 137L).as("nb"))
          .unionByName(cust.filter(col("c_custkey") % 9 === 1)
            .select((col("c_custkey") + 1000000L).as("ck"),
              (col("cents") * 2L + 11L).as("nb")))
          .createOrReplaceTempView("graft_q227_snap")
        s.sql("""MERGE INTO graftbs.listings AS tgt
                 USING graft_q227_snap AS src ON tgt.c_custkey = src.ck
                 WHEN MATCHED AND src.nb > tgt.bal_cents THEN
                   UPDATE SET bal_cents = src.nb
                 WHEN NOT MATCHED THEN INSERT (c_custkey, bal_cents, status, pb)
                   VALUES (src.ck, src.nb, 'active', src.ck % 10)
                 WHEN NOT MATCHED BY SOURCE AND tgt.pb <= 2 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN
                   UPDATE SET status = 'delisted'""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL MERGE `WHEN NOT MATCHED BY SOURCE` — the full-sync verb
    * ([[graft.sql.SnapshotMergeRule]]): leg 1 pins the pre-sync base;
    * leg 2 the synced state — conditional re-prices, inserts, first-match
    * BY SOURCE routing (hard delete for low buckets, soft delist
    * otherwise). The oracle replays the routing as one CASE over a full
    * outer join of base and snapshot.
    */
  def q227MergeBySource(s: SparkSession, dir: String): DataFrame = {
    val root = stageMergeBySourceHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftbs", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum,
             sum(CASE WHEN status = 'delisted' THEN 1 ELSE 0 END) AS n_delisted
      FROM graftbs.listings VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey),
             sum(CASE WHEN status = 'delisted' THEN 1 ELSE 0 END)
      FROM graftbs.listings""")
  }

  val q227Sql: String =
    """WITH base AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal,
      |    c_custkey % 10 AS pb
      |  FROM customer),
      |snap AS (SELECT c_custkey AS ck,
      |    CAST(round(c_acctbal*100) AS BIGINT) + 137 AS nb
      |  FROM customer WHERE c_custkey % 3 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000,
      |    CAST(round(c_acctbal*100) AS BIGINT) * 2 + 11
      |  FROM customer WHERE c_custkey % 9 = 1),
      |merged AS (SELECT COALESCE(b.k, s.ck) AS k,
      |    CASE WHEN b.k IS NOT NULL AND s.ck IS NOT NULL AND s.nb > b.bal
      |           THEN s.nb
      |         WHEN b.k IS NOT NULL THEN b.bal
      |         ELSE s.nb END AS bal,
      |    CASE WHEN b.k IS NOT NULL AND s.ck IS NULL AND b.pb > 2
      |           THEN 'delisted' ELSE 'active' END AS status,
      |    NOT (b.k IS NOT NULL AND s.ck IS NULL AND b.pb <= 2) AS keep
      |  FROM base b FULL OUTER JOIN snap s ON b.k = s.ck)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(k) AS BIGINT) AS key_sum,
      |  CAST(0 AS BIGINT) AS n_delisted FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT),
      |  CAST(sum(CASE WHEN status = 'delisted' THEN 1 ELSE 0 END) AS BIGINT)
      |FROM merged WHERE keep""".stripMargin

  /** q228's DDL history, staged once per (JVM, sf): the whole table
    * lifecycle in pure SQL — `CREATE TABLE … PARTITIONED BY` provisions
    * v1 as a zero-file manifest ([[graft.sql.GraftCatalog.createTable]] →
    * [[graft.lake.Snapshots.createTable]]), `INSERT INTO` lands the first
    * rows as a protocol append deriving its write shape from the empty
    * manifest, a general `MERGE` upserts order revenue into it, and CTAS
    * provisions + appends a second table from the first. (Reference
    * framing: the reference creates tables implicitly on first write,
    * storage/pipeline/publishers.py:65-144 — here provisioning is an
    * explicit verb, and DROP has vacuum-to-zero semantics, spec-pinned.)
    */
  private def stageSqlDdlHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlddl_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        graft.sql.GraftCatalog.install(s, "graftddl2", root)
        s.sql("""CREATE TABLE graftddl2.bal
                 (c_custkey BIGINT, bal_cents BIGINT, pb BIGINT)
                 PARTITIONED BY (pb)""")
        Tables.customer(s, dir).createOrReplaceTempView("graft_q228_cust")
        Tables.orders(s, dir).createOrReplaceTempView("graft_q228_ord")
        s.sql("""INSERT INTO graftddl2.bal
                 SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT),
                        c_custkey % 10
                 FROM graft_q228_cust WHERE c_custkey % 5 <> 0""")
        s.sql("""MERGE INTO graftddl2.bal AS tgt
                 USING (SELECT o_custkey AS ck,
                          sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS delta
                        FROM graft_q228_ord GROUP BY o_custkey) AS src
                 ON tgt.c_custkey = src.ck
                 WHEN MATCHED THEN
                   UPDATE SET bal_cents = tgt.bal_cents + src.delta
                 WHEN NOT MATCHED THEN INSERT (c_custkey, bal_cents, pb)
                   VALUES (src.ck, src.delta, src.ck % 10)""")
        s.sql("""CREATE TABLE graftddl2.top PARTITIONED BY (pb)
                 AS SELECT * FROM graftddl2.bal WHERE bal_cents > 5000000""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL DDL lifecycle: leg 1 = the CREATEd table's v1 (a typed EMPTY
    * relation — zero rows, zero-coalesced sums), leg 2 = the table after
    * INSERT + MERGE, leg 3 = the CTAS table. Every value oracle-recomputed
    * from customer/orders.
    */
  def q228SqlDdl(s: SparkSession, dir: String): DataFrame = {
    val root = stageSqlDdlHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftddl2", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             coalesce(sum(bal_cents), 0) AS bal_sum,
             coalesce(sum(c_custkey), 0) AS key_sum
      FROM graftddl2.bal VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), coalesce(sum(bal_cents), 0),
             coalesce(sum(c_custkey), 0)
      FROM graftddl2.bal
      UNION ALL
      SELECT CAST(3 AS BIGINT), count(*), coalesce(sum(bal_cents), 0),
             coalesce(sum(c_custkey), 0)
      FROM graftddl2.top""")
  }

  val q228Sql: String =
    """WITH base AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
      |  FROM customer WHERE c_custkey % 5 <> 0),
      |ops AS (SELECT o_custkey AS ck,
      |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS delta
      |  FROM orders GROUP BY 1),
      |merged AS (SELECT COALESCE(b.k, o.ck) AS k,
      |    CASE WHEN b.k IS NOT NULL AND o.ck IS NOT NULL THEN b.bal + o.delta
      |         WHEN b.k IS NOT NULL THEN b.bal
      |         ELSE o.delta END AS bal
      |  FROM base b FULL OUTER JOIN ops o ON b.k = o.ck)
      |SELECT CAST(1 AS BIGINT) AS leg, CAST(0 AS BIGINT) AS n_rows,
      |  CAST(0 AS BIGINT) AS bal_sum, CAST(0 AS BIGINT) AS key_sum
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM merged
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM merged WHERE bal > 5000000""".stripMargin

  /** q229's evolution history, staged once per (JVM, sf): v1 = customers
    * with `c_custkey % 4 != 1` (no `tier` column); ONE `MERGE WITH SCHEMA
    * EVOLUTION` whose source carries the new STRING `tier` — Spark's own
    * resolution (the DML table declares AUTOMATIC_SCHEMA_EVOLUTION)
    * computes the AddColumn diff and publishes a metadata-only evolved
    * version through `GraftCatalog.alterTable` →
    * [[graft.lake.Snapshots.evolveSchema]], then the merge routes
    * normally: matched rows take the source's bal and tier (`SET *`),
    * unmatched snapshot rows insert.
    */
  private def stageMergeEvolveHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlmev_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir)
          .filter(col("c_custkey") % 4 =!= 1)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "bal", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftmev", root)
        Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"),
            (round(col("c_acctbal") * 100).cast("long") + 55L).as("bal_cents"),
            when(col("c_acctbal") > 5000.0, "hi").otherwise("lo").as("tier"),
            (col("c_custkey") % 10).as("pb"))
          .createOrReplaceTempView("graft_q229_snap")
        s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graftmev.bal AS tgt
                 USING graft_q229_snap AS src
                 ON tgt.c_custkey = src.c_custkey
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** `MERGE WITH SCHEMA EVOLUTION`: leg 1 reads the PRE-merge version and
    * pins (q213's invariant) that `tier` does NOT exist there (-1
    * sentinels); leg 2 reads the merged state — matched rows re-priced
    * and tiered, unmatched base rows read the evolved column as null,
    * snapshot-only rows inserted. Oracle recomputes both legs.
    */
  def q229MergeEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = stageMergeEvolveHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftmev", root)
    val v1 = graft.lake.Snapshots.readVersion(s, root, "bal", 1L)
    val (nt, nh) =
      if (v1.columns.contains("tier"))
        (count(col("tier")), count(when(col("tier") === "hi", 1)))
      else (lit(-1L), lit(-1L)) // pins that the column does NOT exist at v1
    val leg1 = v1.groupBy().agg(
        count(lit(1)).as("n_rows"),
        sum(col("bal_cents")).as("bal_sum"),
        sum(col("c_custkey")).as("key_sum"),
        nt.cast("long").as("n_tier"), nh.cast("long").as("n_hi"))
      .withColumn("leg", lit(1L))
    val leg2 = s.sql("""
      SELECT count(*) AS n_rows, sum(bal_cents) AS bal_sum,
             sum(c_custkey) AS key_sum, count(tier) AS n_tier,
             count(CASE WHEN tier = 'hi' THEN 1 END) AS n_hi
      FROM graftmev.bal""").withColumn("leg", lit(2L))
    leg1.unionByName(leg2)
      .select("leg", "n_rows", "bal_sum", "key_sum", "n_tier", "n_hi")
  }

  val q229Sql: String =
    """WITH base AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
      |  FROM customer WHERE c_custkey % 4 <> 1),
      |snap AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) + 55 AS bal,
      |    CASE WHEN c_acctbal > 5000 THEN 'hi' ELSE 'lo' END AS tier
      |  FROM customer WHERE c_custkey % 2 = 0),
      |merged AS (SELECT COALESCE(b.k, s.k) AS k,
      |    COALESCE(s.bal, b.bal) AS bal, s.tier AS tier
      |  FROM base b FULL OUTER JOIN snap s ON b.k = s.k)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(k) AS BIGINT) AS key_sum,
      |  CAST(-1 AS BIGINT) AS n_tier, CAST(-1 AS BIGINT) AS n_hi FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT), count(tier),
      |  count(CASE WHEN tier = 'hi' THEN 1 END) FROM merged""".stripMargin

  /** q230's maintenance history, staged once per (JVM, sf): three appends
    * (12 files across 4 buckets), one merge-on-read delete (v4), then the
    * SQL verb `OPTIMIZE … ZORDER BY (o_orderkey)`
    * ([[graft.sql.GraftSqlParser]] → [[graft.lake.Snapshots.compact]]) —
    * v5 rewrites the table into fewer Z-ordered files with the vector
    * folded away. VACUUM's retention refusal is spec-pinned
    * (MaintenanceSqlSpec) — a gate can't hash wall-clock-dependent
    * deletions.
    */
  private def stageOptimizeHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlopt_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.orders(s, dir).select(
          col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          (col("o_orderkey") % 4).as("ob"))
        (0 until 3).foreach { i =>
          graft.lake.Snapshots.append(
            base.filter(col("o_orderkey") % 3 === i),
            root, "ord", Seq("ob"), statsCols = Seq("o_orderkey"))
        }
        graft.lake.Snapshots.deleteWhere(s, root, "ord",
          col("o_orderkey") % 7 === 0) // v4: a MOR vector
        graft.sql.GraftCatalog.install(s, "graftq230", root)
        s.sql("OPTIMIZE graftq230.ord ZORDER BY (o_orderkey)") // v5
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL `OPTIMIZE … ZORDER BY`: legs 1 and 2 read the pre- and
    * post-compact versions — identical by the result-invariance contract
    * (the rewrite folds the delete vector in); leg 3 reads the `history`
    * metadata table (q224 machinery): the compact version carries FEWER
    * files than its predecessor, zero delete vectors, and exactly one
    * 'compact' operation exists.
    */
  def q230SqlOptimize(s: SparkSession, dir: String): DataFrame = {
    val root = stageOptimizeHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftq230", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS v1,
             sum(cents) AS v2, sum(o_orderkey) AS v3
      FROM graftq230.ord VERSION AS OF 4
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(cents), sum(o_orderkey)
      FROM graftq230.ord
      UNION ALL
      SELECT CAST(3 AS BIGINT),
             CAST(CASE WHEN c.n_files < p.n_files THEN 1 ELSE 0 END AS BIGINT),
             CAST(c.n_delete_vectors AS BIGINT),
             (SELECT count(*) FROM graftq230.ord.history
              WHERE operation = 'compact')
      FROM graftq230.ord.history c JOIN graftq230.ord.history p
        ON c.version = p.version + 1
      WHERE c.version = 5""")
  }

  val q230Sql: String =
    """WITH o AS (SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS v1,
      |  CAST(sum(cents) AS BIGINT) AS v2, CAST(sum(k) AS BIGINT) AS v3
      |FROM o
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(cents) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM o
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT),
      |  CAST(1 AS BIGINT)""".stripMargin

  /** q231's subquery-UPDATE history, staged once per (JVM, sf): v1 = all
    * customers; ONE `UPDATE` whose SET value carries an uncorrelated
    * SCALAR subquery and whose WHERE carries an IN subquery — both
    * executed once at statement-run time
    * ([[graft.sql.DmlRebind.materializeSubqueries]]), so discovery and
    * rewrite see identical values: the scalar inlines as a literal, the
    * IN inlines its distinct values when dimension-sized and otherwise
    * (past `spark.graft.dml.maxInlineSubqueryRows` — the sf0.1 bench
    * shape: 13k distinct hot customers) materializes the key set once
    * and evaluates as a semi join against the pinned base. Correlated
    * subqueries refuse (spec-pinned): a per-row subquery is a join —
    * spelled as MERGE.
    */
  private def stageSubqueryUpdateHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_sqlsub_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir).select(
          col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          (col("c_custkey") % 10).as("pb"))
        graft.lake.Snapshots.commit(base.repartitionByRange(4, col("c_custkey")),
          root, "bal", Seq("pb"), statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftq231", root)
        Tables.orders(s, dir).createOrReplaceTempView("graft_q231_ord")
        s.sql("""UPDATE graftq231.bal
                 SET bal_cents = bal_cents +
                   (SELECT max(CAST(round(o_totalprice * 100) AS BIGINT))
                    FROM graft_q231_ord)
                 WHERE c_custkey IN (SELECT o_custkey FROM graft_q231_ord
                                     WHERE o_totalprice > 400000)""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL UPDATE with inlined subqueries: leg 1 = the pre-update base;
    * leg 2 = the updated state — customers with a >400k order gained the
    * corpus-max order price. The oracle recomputes both subqueries and
    * the conditional projection from customer/orders.
    */
  def q231SubqueryUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = stageSubqueryUpdateHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftq231", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
             sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum
      FROM graftq231.bal VERSION AS OF 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
      FROM graftq231.bal""")
  }

  val q231Sql: String =
    """WITH base AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
      |  FROM customer),
      |mx AS (SELECT max(CAST(round(o_totalprice*100) AS BIGINT)) AS m
      |  FROM orders),
      |hot AS (SELECT DISTINCT o_custkey AS hk FROM orders
      |  WHERE o_totalprice > 400000)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(k) AS BIGINT) AS key_sum FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*),
      |  CAST(sum(CASE WHEN k IN (SELECT hk FROM hot)
      |             THEN bal + (SELECT m FROM mx) ELSE bal END) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM base""".stripMargin

  val q219Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |last AS (SELECT * FROM (
      |    SELECT o_custkey AS ck,
      |      CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
      |      CAST(round(o_totalprice*100) AS BIGINT) AS cents,
      |      row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders) WHERE rn = 1),
      |merged AS (
      |  SELECT COALESCE(b.c_custkey, l.ck) AS k,
      |    CASE WHEN l.op = 'U' THEN l.cents ELSE b.bal END AS bal
      |  FROM base b FULL OUTER JOIN last l ON b.c_custkey = l.ck
      |  WHERE COALESCE(l.op, '') <> 'D')
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum FROM base
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM merged
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT) FROM merged""".stripMargin

  /** CDC apply / MERGE INTO ([[graft.operators.Cdc]]): treat orders as an
    * ordered change log over customer balances — order status 'F'
    * (fulfilled-and-closed in this synthetic mapping) deletes the account,
    * anything else upserts the latest order's price as the new balance in
    * exact cents; last writer per custkey wins by (o_orderdate,
    * o_orderkey). One key-partitioned compaction window + ONE full-outer
    * equi-join against the base snapshot.
    */
  def q107CdcMerge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(
      col("c_custkey"),
      col("c_name"),
      col("c_nationkey").cast("int").as("c_nationkey"),
      round(col("c_acctbal") * 100).cast("long").as("c_acctbal_cents"))
    val ops = Tables.orders(s, dir).select(
      col("o_custkey").as("c_custkey"),
      col("o_orderdate"), col("o_orderkey"),
      when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    graft.operators.Cdc.merge(base, ops,
        keyCols = Seq("c_custkey"),
        seqCols = Seq("o_orderdate", "o_orderkey"),
        opCol = "op", deleteOp = "D",
        valueCols = Map("c_acctbal_cents" -> col("cents")))
      .withColumnRenamed("__changed", "changed")
  }

  val q107Sql: String =
    """WITH ops AS (SELECT o_custkey AS c_custkey, o_orderdate, o_orderkey,
      |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
      |  FROM orders),
      |last AS (SELECT * FROM ops
      |  QUALIFY row_number() OVER (PARTITION BY c_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
      |base AS (SELECT c_custkey, c_name, CAST(c_nationkey AS INT) AS c_nationkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS c_acctbal_cents
      |  FROM customer)
      |SELECT coalesce(b.c_custkey, l.c_custkey) AS c_custkey, b.c_name,
      |  b.c_nationkey,
      |  CASE WHEN l.op = 'U' THEN l.cents ELSE b.c_acctbal_cents END AS c_acctbal_cents,
      |  CAST(CASE WHEN l.op = 'U' THEN 1 ELSE 0 END AS INT) AS changed
      |FROM base b FULL OUTER JOIN last l ON b.c_custkey = l.c_custkey
      |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin

  /** Streaming CDC apply — the maintenance loop a lake table actually
    * runs: an AvailableNow file stream of ops feeds `foreachBatch`, each
    * batch [[graft.operators.Cdc.mergeStateful]]'d into a
    * [[graft.lake.Snapshots]]-VERSIONED state table — streaming and batch
    * share ONE commit protocol (put-if-absent manifests via
    * `commitRetry`), and the CDC state gets time travel, a schema
    * contract, and stats sidecars for free (previously a hand-rolled
    * read-v{n}/write-v{n+1} directory scheme). Replay safety comes from
    * the STATE's semantics, not batch-id addressing: `mergeStateful` is
    * seq-guarded, so re-applying an already-applied batch against the
    * latest state is a no-op (equal seqs lose; tombstones hold) — the
    * foreachBatch retry contract without bespoke versioning.
    * The state carries each key's winning (ts_ns, event_id) and
    * a delete tombstone, so last-writer-wins holds GLOBALLY across
    * batches even though the staged files deliver ops out of seq order —
    * `maxFilesPerTrigger = 2` forces 4 micro-batches precisely to
    * exercise that path (a plain per-batch merge diverges here).
    * Events play a balance change log: 'error' closes the account,
    * anything else upserts the event's value in cents, last (ts_ns,
    * event_id) wins. Even user ids pre-exist with zero balances (so
    * carry-over/update/delete all exercise); odd ids arrive as streaming
    * inserts. Deterministic end state → full DuckDB replay.
    */
  def q108StreamingCdc(s: SparkSession, dir: String): DataFrame = {
    import graft.lake.Snapshots
    val ops = Tables.events(s, dir).select(
      col("user_id"), col("ts_ns"), col("event_id"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      round(col("value") * 100).cast("long").as("cents"))
    val src = stageOnce(ops, "cdc_ops", dir)

    val base = Tables.events(s, dir).select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("balance_cents", lit(0L))

    val tag = math.abs(dir.hashCode)
    val stateRoot = s"/tmp/graft_q108_state_$tag"
    val ckpt = s"${graft.LocalScratch.dir()}/graft_q108_ckpt_$tag"
    // full-rebuild gate, not a resume test (I6 covers resume): fresh
    // state + checkpoint per invocation
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
    Seq(stateRoot, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    Snapshots.replace(
      graft.operators.Cdc.seedState(base, ops, Seq("ts_ns", "event_id"))
        .repartition(4),
      stateRoot, "state")

    val stream = Incremental.fileStream(s, src, ops.schema,
      maxFilesPerTrigger = Some(2))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val latest = Snapshots.latestVersion(s, stateRoot, "state").get
        val st = Snapshots.readVersion(s, stateRoot, "state", latest)
        Snapshots.replaceRetry(
          graft.operators.Cdc.mergeStateful(st, batch,
              keyCols = Seq("user_id"), seqCols = Seq("ts_ns", "event_id"),
              opCol = "op", deleteOp = "D",
              valueCols = Map("balance_cents" -> col("cents")))
            .repartition(4),
          stateRoot, "state")
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    graft.operators.Cdc.currentView(Snapshots.readVersion(s, stateRoot,
      "state", Snapshots.latestVersion(s, stateRoot, "state").get))
  }

  val q108Sql: String =
    """WITH ops AS (SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |last AS (SELECT * FROM ops
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1),
      |base AS (SELECT DISTINCT user_id, CAST(0 AS BIGINT) AS balance_cents
      |  FROM events WHERE user_id % 2 = 0)
      |SELECT coalesce(b.user_id, l.user_id) AS user_id,
      |  CASE WHEN l.op = 'U' THEN l.cents ELSE b.balance_cents END AS balance_cents
      |FROM base b FULL OUTER JOIN last l ON b.user_id = l.user_id
      |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin

  /** Merge-on-read row-level deletes ([[graft.lake.DeleteVectors]]):
    * base + two OVERLAPPING equality-delete batches (idempotence is
    * live), read once through the anti join ('mor' phase), then
    * `compact` folds deletes into the base and the second read must see
    * the identical table ('compacted' phase — no delete files left).
    * The oracle computes the surviving set once and expects it twice.
    */
  def q165DeleteVectors(s: SparkSession, dir: String): DataFrame = {
    // dir-keyed root: concurrent JVMs (tests, scale harness) on
    // DIFFERENT fixture dirs must not race on one staging path
    val root = s"/tmp/graft_mor_${math.abs(dir.hashCode)}"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), s.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(root), true)
    val base = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100).cast("long").as("total_cents"))
    graft.lake.DeleteVectors.writeBase(base, root, "orders")
    graft.lake.DeleteVectors.appendDeletes(
      base.filter(col("k") % 7 === 0).select("k"), root, "orders")
    graft.lake.DeleteVectors.appendDeletes( // overlaps the %7 batch
      base.filter(col("k") % 11 === 3).select("k"), root, "orders")
    def agg(phase: String) = graft.lake.DeleteVectors
      .readMerged(s, root, "orders", Seq("k"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_orders"), sum("total_cents").as("cents"))
      .select(lit(phase).as("phase"), col("status"), col("n_orders"), col("cents"))
    // materialize the MOR phase BEFORE compact rewrites the base files
    val morRows = agg("mor").collect() // dimension-sized: one row per status
    val mor = s.createDataFrame(
      java.util.Arrays.asList(morRows: _*), agg("mor").schema)
    graft.lake.DeleteVectors.compact(s, root, "orders", Seq("k"))
    mor.unionByName(agg("compacted"))
  }

  val q165Sql: String =
    """WITH o AS (SELECT o_orderstatus AS status,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      |  WHERE NOT (o_orderkey % 7 = 0 OR o_orderkey % 11 = 3)),
      |a AS (SELECT status, count(*) AS n_orders,
      |    CAST(sum(cents) AS BIGINT) AS cents FROM o GROUP BY 1)
      |SELECT 'mor' AS phase, status, n_orders, cents FROM a
      |UNION ALL
      |SELECT 'compacted' AS phase, status, n_orders, cents FROM a""".stripMargin

  /** Additive schema evolution ([[graft.lake.SchemaEvolution]]): batch 0
    * writes (cust LONG, nation INT, bal_cents INT); batch 1 widens
    * bal_cents to LONG and adds a segment column. `readAll` reconciles
    * per-batch footer schemas up the widening lattice (the mergeSchema
    * option would throw on int32-vs-int64) and null-fills the column
    * batch 0 predates — provenance kept via `_batch`. The widened
    * column is the VALUE column, never the key: ids must survive a
    * 100× blowup, and the x100 scale harness rejects an int32 key cast.
    */
  def q166SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_evolve_${math.abs(dir.hashCode)}"
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), s.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(root), true)
    val c = Tables.customer(s, dir).select(
      col("c_custkey"), col("c_nationkey"),
      round(col("c_acctbal") * 100).as("bal"), col("c_mktsegment"))
    graft.lake.SchemaEvolution.writeBatch(
      c.filter(col("c_custkey") % 2 === 0).select(
        col("c_custkey").cast("long").as("cust"),
        col("c_nationkey").cast("int").as("nation"),
        col("bal").cast("int").as("bal_cents")),
      root, "customers", batch = 0)
    graft.lake.SchemaEvolution.writeBatch(
      c.filter(col("c_custkey") % 2 === 1).select(
        col("c_custkey").cast("long").as("cust"),
        col("c_nationkey").cast("int").as("nation"),
        col("bal").cast("long").as("bal_cents"),
        col("c_mktsegment").as("segment")),
      root, "customers", batch = 1)
    graft.lake.SchemaEvolution.readAll(s, root, "customers")
      .groupBy(col("_batch").as("batch"),
        coalesce(col("segment"), lit("<none>")).as("segment"))
      .agg(count(lit(1)).as("n"), sum("bal_cents").as("bal_cents"))
  }

  val q166Sql: String =
    """WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer)
      |SELECT 0 AS batch, '<none>' AS segment, count(*) AS n,
      |  CAST(sum(bal) AS BIGINT) AS bal_cents FROM c WHERE k % 2 = 0
      |UNION ALL
      |SELECT 1 AS batch, seg AS segment, count(*) AS n,
      |  CAST(sum(bal) AS BIGINT) AS bal_cents FROM c WHERE k % 2 = 1
      |GROUP BY 2""".stripMargin

  /** Join-view incremental maintenance ([[graft.operators.JoinIvm]]):
    * a materialized orders⋈customer view maintained under append-only
    * deltas ON BOTH SIDES via Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB. Splits are
    * chosen so all delta terms are non-empty (new orders hit old AND new
    * customers; old orders hit new customers); the oracle is the full
    * re-join — the maintained view must equal recompute exactly (any
    * double-counted or dropped term breaks counts).
    */
  def q172JoinIvm(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir).select(
      col("o_custkey").as("cust"), col("o_orderkey").as("okey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val b = Tables.customer(s, dir).select(
      col("c_custkey").as("cust"), col("c_nationkey").cast("int").as("nation"))
    val aOld = a.filter(col("okey") % 10 < 8).drop("okey")
    val aDelta = a.filter(col("okey") % 10 >= 8).drop("okey")
    val bOld = b.filter(col("cust") % 5 =!= 0)
    val bDelta = b.filter(col("cust") % 5 === 0)
    val jOld = aOld.join(bOld, Seq("cust"))
    graft.operators.JoinIvm
      .maintain(jOld, aOld, aDelta, bOld, bDelta, Seq("cust"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
  }

  val q172Sql: String =
    """SELECT CAST(c_nationkey AS INT) AS nation, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Incremental ETL end to end: versioned lakes feed the join IVM
    * through the change-data feed — [[graft.lake.Snapshots.diff]] v1→v2
    * produces the delta batches for BOTH sides of a lineitem⋈orders
    * view, [[graft.operators.JoinIvm.maintain]] applies them, and the
    * result must equal the full re-join of the v2 tables. This is the
    * composition a daily pipeline runs: no reprocessing of v1 data, only
    * CDF rows move.
    */
  /** q173's versioned li/ord history (two commits each), staged once per
    * (JVM, sf) like its q204/q209 siblings: the 4-commit replay is fixture
    * I/O, not query cost, and re-staging it on every invocation overstated
    * the IVM's bench time ~4s. Dir-keyed root per the concurrent-JVM
    * invariant; versions 1-2 of each table are deterministic.
    */
  private def stageCdfIvmHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_cdfivm_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val li = Tables.lineitem(s, dir).select(
          col("l_orderkey").as("okey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          (col("l_orderkey") % 4).as("pb"))
        val o = Tables.orders(s, dir).select(
          col("o_orderkey").as("okey"), col("o_orderstatus").as("status"),
          (col("o_orderkey") % 4).as("pc"))
        graft.lake.Snapshots.commit(li.filter(col("okey") % 3 =!= 0), root, "li", Seq("pb"))
        graft.lake.Snapshots.commit(li, root, "li", Seq("pb"))
        graft.lake.Snapshots.commit(o.filter(col("okey") % 7 =!= 0), root, "ord", Seq("pc"))
        graft.lake.Snapshots.commit(o, root, "ord", Seq("pc"))
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  def q173CdfJoinIvm(s: SparkSession, dir: String): DataFrame = {
    val root = stageCdfIvmHistory(s, dir)
    def v1(t: String, cols: Seq[String]) = graft.lake.Snapshots
      .readVersion(s, root, t, 1L).select(cols.map(col): _*)
    def ins(t: String, cols: Seq[String]) = graft.lake.Snapshots
      .diff(s, root, t, 1L, 2L)
      .filter(col("change_type") === "insert").select(cols.map(col): _*)
    val aOld = v1("li", Seq("okey", "cents"))
    val bOld = v1("ord", Seq("okey", "status"))
    val jOld = aOld.join(bOld, Seq("okey"))
    graft.operators.JoinIvm.maintain(jOld,
        aOld, ins("li", Seq("okey", "cents")),
        bOld, ins("ord", Seq("okey", "status")), Seq("okey"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
  }

  val q173Sql: String =
    """SELECT o_orderstatus AS status, count(*) AS n,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** q233's streamed-ingest history, staged once per (JVM, sf): the table
    * is provisioned EMPTY (`Snapshots.createTable`), then ingested purely
    * through `df.writeStream.toTable` — the snapshot protocol's streaming
    * front door ([[graft.sql.StreamingSnapshotTable]]). Run 1 streams four
    * source files two per micro-batch (TWO epoch commits, each a manifest
    * carrying its `(queryId, epochId)` identity); one more source file
    * lands and run 2 RESTARTS from the checkpoint (one more epoch;
    * already-consumed files never reprocess, the exactly-once ledger
    * dedups any replay). Everything is verifiable from the final table +
    * the history metadata table.
    */
  private def stageStreamWriteHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_swrite_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val ev = Tables.events(s, dir).select(
          col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"),
          (col("event_id") % 4).as("pb"))
        graft.lake.Snapshots.createTable(s, root, "ingest", ev.schema,
          Seq("pb"))
        graft.sql.GraftCatalog.install(s, "graftingest", root)
        val src = s"$root/_src"; val cp = s"$root/_cp"
        def run(): Unit = {
          val q = s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "2").parquet(src)
            .writeStream.option("checkpointLocation", cp)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("graftingest.ingest")
          q.awaitTermination()
        }
        ev.filter(col("event_id") % 3 === 0).repartition(4)
          .write.mode("append").parquet(src)
        run() // 4 files, 2 per trigger → epochs 0 and 1
        ev.filter(col("event_id") % 3 === 1).coalesce(1)
          .write.mode("append").parquet(src)
        run() // checkpointed restart → epoch 2 over the new file only
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** Streaming write into a versioned table (`writeStream.toTable`): the
    * read-back per-partition aggregates must equal the source slices the
    * two runs streamed — exactly once each, across a checkpointed restart
    * — and the history must show exactly THREE epoch commits (operation
    * 'stream'), pinned via a scalar subquery over the history metadata
    * table.
    */
  def q233StreamTableWrite(s: SparkSession, dir: String): DataFrame = {
    val root = stageStreamWriteHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftingest", root)
    s.sql("""
      SELECT pb, count(*) AS n,
             sum(event_id) AS id_sum, sum(value_cents) AS vc_sum,
             (SELECT count(*) FROM graftingest.ingest.history
              WHERE operation = 'stream') AS n_epochs
      FROM graftingest.ingest
      GROUP BY pb""")
  }

  val q233Sql: String =
    """SELECT event_id % 4 AS pb, count(*) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS vc_sum,
      |  CAST(3 AS BIGINT) AS n_epochs
      |FROM events WHERE event_id % 3 IN (0, 1)
      |GROUP BY 1""".stripMargin

  /** q234's rollback history, staged once per (JVM, sf): v1 = the full
    * table; v2 = a SQL `DELETE` (merge-on-read vector — no file removed);
    * v3 = `RESTORE TABLE … TO VERSION AS OF 1` (drops the vector by
    * re-pointing at v1's manifest content); v4 = `RESTORE … VERSION AS OF
    * 2` (re-applies it — the vector and its addedAt attribution carry
    * through a restore verbatim). Both restores are metadata-only: no
    * data file is written or removed.
    */
  private def stageRestoreHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_restore_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir).select(col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          (col("c_custkey") % 8).as("pb"))
        graft.lake.Snapshots.commit(base, root, "balances", Seq("pb"),
          statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "graftrest", root)
        s.sql("DELETE FROM graftrest.balances WHERE c_custkey % 5 = 0")
        s.sql("RESTORE TABLE graftrest.balances TO VERSION AS OF 1")
        s.sql("RESTORE TABLE graftrest.balances VERSION AS OF 2")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** SQL `RESTORE TABLE … VERSION AS OF n` — rollback as a forward-only,
    * metadata-only new version: leg v3 must hash-equal the pre-delete
    * table, leg v4 must hash-equal the post-delete one (the carried
    * merge-on-read vector re-applies), and the history pins two 'restore'
    * operations that each added ZERO files.
    */
  def q234SqlRestore(s: SparkSession, dir: String): DataFrame = {
    val root = stageRestoreHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftrest", root)
    s.sql("""
      SELECT leg, n_rows, bal_sum, key_sum,
             (SELECT count(*) FROM graftrest.balances.history
              WHERE operation = 'restore' AND n_added_files = 0) AS n_restores
      FROM (
        SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
               sum(bal_cents) AS bal_sum, sum(c_custkey) AS key_sum
        FROM graftrest.balances VERSION AS OF 2
        UNION ALL
        SELECT CAST(2 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
        FROM graftrest.balances VERSION AS OF 3
        UNION ALL
        SELECT CAST(3 AS BIGINT), count(*), sum(bal_cents), sum(c_custkey)
        FROM graftrest.balances)""")
  }

  val q234Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer),
      |kept AS (SELECT * FROM base WHERE c_custkey % 5 <> 0)
      |SELECT CAST(1 AS BIGINT) AS leg, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(2 AS BIGINT) AS n_restores
      |FROM kept
      |UNION ALL
      |SELECT 2, count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(c_custkey) AS BIGINT), 2 FROM base
      |UNION ALL
      |SELECT 3, count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(c_custkey) AS BIGINT), 2 FROM kept""".stripMargin

  /** Batch change feed (`SELECT … FROM <cat>.<t>.changes` — Delta's
    * `table_changes(t, v1, v2)` one-shot spelling) over q224's staged
    * four-verb history: versions 1-3 replay as two insert legs and one
    * key-level delete leg (same attribution machinery as the q223
    * STREAM, one shared planner), and leg 4 proves the skipChangeCommits
    * contract — widening the window over the file-removing compact (v4)
    * with skip on yields EXACTLY the same changes, no phantom inserts.
    */
  def q235TableChanges(s: SparkSession, dir: String): DataFrame = {
    val root = stageHistoryGate(s, dir)
    graft.sql.GraftCatalog.install(s, "grafthist", root)
    def window(start: Long, end: Long, skip: Boolean): DataFrame = {
      s.conf.set("spark.graft.changes.startVersion", start.toString)
      s.conf.set("spark.graft.changes.endVersion", end.toString)
      s.conf.set("spark.graft.changes.skipChangeCommits", skip.toString)
      // spark.sql analyzes EAGERLY: the window is baked into the relation
      // at load time, so the conf round-trip never leaks across legs
      try s.sql("""SELECT _commit_version AS v, _change_type AS change_type,
                   count(*) AS n_rows, sum(event_id) AS id_sum
                   FROM grafthist.events.changes GROUP BY 1, 2""")
      finally Seq("startVersion", "endVersion", "skipChangeCommits")
        .foreach(k => s.conf.unset(s"spark.graft.changes.$k"))
    }
    window(1, 3, skip = false).withColumn("leg", lit(1L))
      .unionByName(window(1, 4, skip = true).withColumn("leg", lit(2L)))
  }

  val q235Sql: String =
    """WITH a AS (SELECT event_id FROM events WHERE event_id % 5 = 0),
      |b AS (SELECT event_id FROM events WHERE event_id % 5 = 1),
      |d AS (SELECT DISTINCT event_id FROM a WHERE event_id % 10 = 0),
      |legs AS (
      |  SELECT CAST(1 AS BIGINT) AS v, 'insert' AS change_type,
      |    count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_sum
      |  FROM a
      |  UNION ALL
      |  SELECT 2, 'insert', count(*), CAST(sum(event_id) AS BIGINT) FROM b
      |  UNION ALL
      |  SELECT 3, 'delete', count(*), CAST(sum(event_id) AS BIGINT) FROM d)
      |SELECT v, change_type, n_rows, id_sum, CAST(1 AS BIGINT) AS leg
      |FROM legs
      |UNION ALL
      |SELECT v, change_type, n_rows, id_sum, CAST(2 AS BIGINT) AS leg
      |FROM legs""".stripMargin

  /** q236's correlated-subquery DML history, staged once per (JVM, sf):
    * v1 = customer balances (pb-partitioned); v2 = an EXISTS-delete
    * correlated on the order relation (merge-on-read vector of the
    * matching keys — evaluated as a semi join, no file rewritten); v3 =
    * a NOT-EXISTS delete (anti join: customers with no order at all);
    * v4 = an UPDATE whose WHERE is a NON-EQUI correlated EXISTS (order
    * value exceeding the customer's balance) — copy-on-write through the
    * same existence-join machinery MERGE runs.
    */
  private def stageExistsDmlHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_exdml_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir).select(col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          (col("c_custkey") % 8).as("pb"))
        graft.lake.Snapshots.commit(base, root, "balances", Seq("pb"))
        graft.sql.GraftCatalog.install(s, "graftex", root)
        Tables.orders(s, dir).select(col("o_custkey").as("k"),
            col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .createOrReplaceTempView("graft_q236_ord")
        s.sql("""DELETE FROM graftex.balances AS t WHERE EXISTS (
                   SELECT 1 FROM graft_q236_ord o
                   WHERE o.k = t.c_custkey AND o.st = 'F')""")
        s.sql("""DELETE FROM graftex.balances AS t WHERE NOT EXISTS (
                   SELECT 1 FROM graft_q236_ord o
                   WHERE o.k = t.c_custkey AND o.k % 3 = 0)""")
        s.sql("""UPDATE graftex.balances AS t SET bal_cents = bal_cents + 7
                 WHERE EXISTS (
                   SELECT 1 FROM graft_q236_ord o
                   WHERE o.k = t.c_custkey AND o.cents > t.bal_cents)""")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** Correlated EXISTS/NOT EXISTS deletes + a non-equi correlated-EXISTS
    * update, pure SQL over the snapshot DML surface; the history column
    * pins that both deletes stayed MERGE-ON-READ (two 'delete' versions,
    * zero files added) and the update committed copy-on-write.
    */
  def q236ExistsDml(s: SparkSession, dir: String): DataFrame = {
    val root = stageExistsDmlHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftex", root)
    s.sql("""
      SELECT pb, count(*) AS n, sum(bal_cents) AS bal_sum,
             sum(c_custkey) AS key_sum,
             (SELECT count(*) FROM graftex.balances.history
              WHERE operation = 'delete' AND n_added_files = 0) AS n_mor_deletes
      FROM graftex.balances
      GROUP BY pb""")
  }

  val q236Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer),
      |ord AS (SELECT o_custkey AS k, o_orderstatus AS st,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
      |d1 AS (SELECT * FROM base t WHERE NOT EXISTS (
      |    SELECT 1 FROM ord o WHERE o.k = t.c_custkey AND o.st = 'F')),
      |d2 AS (SELECT * FROM d1 t WHERE EXISTS (
      |    SELECT 1 FROM ord o WHERE o.k = t.c_custkey AND o.k % 3 = 0)),
      |up AS (SELECT c_custkey,
      |    bal + CASE WHEN EXISTS (SELECT 1 FROM ord o
      |                            WHERE o.k = d2.c_custkey
      |                              AND o.cents > d2.bal)
      |          THEN 7 ELSE 0 END AS bal
      |  FROM d2)
      |SELECT c_custkey % 8 AS pb, count(*) AS n,
      |  CAST(sum(bal) AS BIGINT) AS bal_sum,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(2 AS BIGINT) AS n_mor_deletes
      |FROM up GROUP BY 1""".stripMargin

  /** q237's CDC-capture history, staged once per (JVM, sf): v1 = customer
    * balances (pb-partitioned commit); then, with `spark.graft.cdc.write`
    * on, v2 = a SQL UPDATE (copy-on-write — files removed; the capture
    * records each hit row as a preimage/postimage pair) and v3 = a
    * partition-replacing MERGE with all three clause kinds (conditioned
    * UPDATE ×2 on matched balances, DELETE on the rest of the matched
    * keys, INSERT of brand-new keys). Both rewrite-shaped versions carry
    * change files in their manifests, so the change feed serves them
    * EXACTLY — the shapes it previously refused by design.
    */
  private def stageCdcHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_cdcfeed_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir).select(col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          (col("c_custkey") % 8).cast("long").as("pb"))
        graft.lake.Snapshots.commit(base, root, "balances", Seq("pb"))
        graft.sql.GraftCatalog.install(s, "graftcdc", root)
        s.conf.set(graft.sql.SnapshotCdc.WriteConf, "true")
        try {
          s.sql("""UPDATE graftcdc.balances SET bal_cents = bal_cents + 5
                   WHERE c_custkey % 7 = 0""")
          base.filter(col("c_custkey") % 3 === 0)
            .select(col("c_custkey").as("k"),
              when(col("c_custkey") % 6 === 0, "U").otherwise("D").as("op"),
              lit(0L).as("newbal"))
            .unionByName(base.filter(col("c_custkey") % 11 === 0)
              .select((col("c_custkey") + 1000000L).as("k"), lit("I").as("op"),
                col("c_custkey").cast("long").as("newbal")))
            .createOrReplaceTempView("graft_q237_src")
          s.sql("""MERGE INTO graftcdc.balances AS t
                   USING graft_q237_src AS src ON t.c_custkey = src.k
                   WHEN MATCHED AND src.op = 'U'
                     THEN UPDATE SET bal_cents = t.bal_cents * 2
                   WHEN MATCHED THEN DELETE
                   WHEN NOT MATCHED AND src.op = 'I' THEN INSERT
                     (c_custkey, bal_cents, pb)
                     VALUES (src.k, src.newbal, src.k % 8)""")
        } finally s.conf.unset(graft.sql.SnapshotCdc.WriteConf)
        // the STREAM leg over the same history: the capture versions flow
        // through the shared planner — one AvailableNow pass to a parquet
        // sink with a persistent checkpoint (idempotent re-invocation)
        val q = s.readStream.format(classOf[graft.sql.CdfSource].getName)
          .option("root", root).option("table", "balances").load()
          .writeStream.format("parquet")
          .option("path", s"$root/_cdc_out")
          .option("checkpointLocation", s"$root/_cdc_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** CDC for rewrite-shaped commits: the batch `.changes` table (leg 1)
    * and the CDF STREAM (leg 2) replay an UPDATE and a partition-replacing
    * MERGE exactly — preimage/postimage pairs for updates, preimages for
    * deletes, postimages for inserts — from the change files the verbs
    * captured at commit time (`spark.graft.cdc.write`). Both legs must
    * agree row-for-row (one shared planner), and the oracle recomputes
    * every change row from the source table.
    */
  def q237CdcFeed(s: SparkSession, dir: String): DataFrame = {
    val root = stageCdcHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "graftcdc", root)
    def agg(df: DataFrame, leg: Long): DataFrame = df
      .groupBy(col("_commit_version").as("v"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_custkey")).as("key_sum"),
        sum(col("bal_cents")).as("bal_sum"))
      .withColumn("leg", lit(leg))
    agg(s.sql("SELECT * FROM graftcdc.balances.changes"), 1L)
      .unionByName(agg(s.read.parquet(s"$root/_cdc_out"), 2L))
  }

  val q237Sql: String =
    """WITH base AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer),
      |u2 AS (SELECT k, bal FROM base WHERE k % 7 = 0),
      |s2 AS (SELECT k,
      |    bal + CASE WHEN k % 7 = 0 THEN 5 ELSE 0 END AS bal FROM base),
      |m_upd AS (SELECT k, bal FROM s2 WHERE k % 6 = 0),
      |m_del AS (SELECT k, bal FROM s2 WHERE k % 3 = 0 AND k % 6 <> 0),
      |ins AS (SELECT k + 1000000 AS k, CAST(k AS BIGINT) AS bal
      |        FROM base WHERE k % 11 = 0),
      |chg AS (
      |  SELECT CAST(1 AS BIGINT) AS v, 'insert' AS ct, k, bal FROM base
      |  UNION ALL SELECT 2, 'update_preimage', k, bal FROM u2
      |  UNION ALL SELECT 2, 'update_postimage', k, bal + 5 FROM u2
      |  UNION ALL SELECT 3, 'update_preimage', k, bal FROM m_upd
      |  UNION ALL SELECT 3, 'update_postimage', k, bal * 2 FROM m_upd
      |  UNION ALL SELECT 3, 'delete', k, bal FROM m_del
      |  UNION ALL SELECT 3, 'insert', k, bal FROM ins),
      |legs AS (
      |  SELECT v, ct AS change_type, count(*) AS n_rows,
      |    CAST(sum(k) AS BIGINT) AS key_sum,
      |    CAST(sum(bal) AS BIGINT) AS bal_sum
      |  FROM chg GROUP BY 1, 2)
      |SELECT v, change_type, n_rows, key_sum, bal_sum,
      |  CAST(1 AS BIGINT) AS leg FROM legs
      |UNION ALL
      |SELECT v, change_type, n_rows, key_sum, bal_sum,
      |  CAST(2 AS BIGINT) AS leg FROM legs""".stripMargin

  /** q238's column-mapping history, staged once per (JVM, sf): v1 = the
    * partitioned commit (c_custkey, bal_cents, note, pb); v2 = `ALTER
    * TABLE RENAME COLUMN bal_cents TO balance` (metadata-only — the
    * files keep spelling `bal_cents`, reads/writes translate); v3 = a
    * SQL INSERT of brand-new keys addressed by the NEW name (its files
    * physically spell the OLD name, so both generations read together);
    * v4 = a MERGE whose ON/SET address the renamed column; v5 = `ALTER
    * TABLE DROP COLUMN note` (metadata-only — bytes stay for time
    * travel).
    */
  private def stageColMapHistory(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_colmap_${math.abs(dir.hashCode)}"
    if (staged.add(root)) {
      try {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(root), true)
        val base = Tables.customer(s, dir).select(col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
          col("c_mktsegment").as("note"),
          (col("c_custkey") % 8).cast("long").as("pb"))
        graft.lake.Snapshots.commit(base, root, "balances", Seq("pb"),
          statsCols = Seq("c_custkey"))
        graft.sql.GraftCatalog.install(s, "gcmq", root)
        s.sql("ALTER TABLE gcmq.balances RENAME COLUMN bal_cents TO balance")
        base.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 2000000L).as("k"),
            col("c_custkey").cast("long").as("bal"))
          .createOrReplaceTempView("graft_q238_ins")
        s.sql("""INSERT INTO gcmq.balances
                 SELECT k, bal, 'x', k % 8 FROM graft_q238_ins""")
        base.filter(col("c_custkey") % 9 === 0)
          .select(col("c_custkey").as("mk"))
          .createOrReplaceTempView("graft_q238_upd")
        s.sql("""MERGE INTO gcmq.balances AS t
                 USING graft_q238_upd AS src ON t.c_custkey = src.mk
                 WHEN MATCHED THEN UPDATE SET balance = t.balance + 1000""")
        s.sql("ALTER TABLE gcmq.balances DROP COLUMN note")
      } catch { case e: Throwable => staged.remove(root); throw e }
    }
    root
  }

  /** Column mapping (RENAME/DROP COLUMN): leg 1 reads the LATEST version
    * per partition — mixed pre-rename and post-rename file generations
    * under the new logical name, post-drop schema; leg 2 time-travels to
    * v1 under the ORIGINAL names (bal_cents + note); leg 3 pushes a
    * filter on the renamed column down the SQL scan; leg 4 pins that
    * every mapping verb was metadata-only (zero files added).
    */
  def q238ColumnMapping(s: SparkSession, dir: String): DataFrame = {
    val root = stageColMapHistory(s, dir)
    graft.sql.GraftCatalog.install(s, "gcmq", root)
    s.sql("""
      SELECT CAST(1 AS BIGINT) AS leg, pb, count(*) AS n_rows,
             sum(balance) AS v1, sum(c_custkey) AS v2
      FROM gcmq.balances GROUP BY pb
      UNION ALL
      SELECT 2, CAST(-1 AS BIGINT), count(*), sum(bal_cents),
             count(DISTINCT note)
      FROM gcmq.balances VERSION AS OF 1
      UNION ALL
      SELECT 3, -1, count(*), sum(balance), sum(c_custkey)
      FROM gcmq.balances WHERE balance BETWEEN 100000 AND 500000
      UNION ALL
      SELECT 4, -1,
             (SELECT count(*) FROM gcmq.balances.history
              WHERE operation = 'rename-column' AND n_added_files = 0),
             (SELECT count(*) FROM gcmq.balances.history
              WHERE operation = 'drop-column' AND n_added_files = 0),
             0""")
  }

  val q238Sql: String =
    """WITH base AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal,
      |    c_mktsegment AS note FROM customer),
      |ins AS (SELECT k + 2000000 AS k, CAST(k AS BIGINT) AS bal
      |        FROM base WHERE k % 13 = 0),
      |s3 AS (SELECT k, bal FROM base UNION ALL SELECT k, bal FROM ins),
      |s4 AS (SELECT k,
      |    bal + CASE WHEN k % 9 = 0 AND k < 2000000 THEN 1000 ELSE 0 END
      |      AS bal FROM s3)
      |SELECT CAST(1 AS BIGINT) AS leg, k % 8 AS pb, count(*) AS n_rows,
      |  CAST(sum(bal) AS BIGINT) AS v1, CAST(sum(k) AS BIGINT) AS v2
      |FROM s4 GROUP BY 2
      |UNION ALL
      |SELECT 2, -1, count(*), CAST(sum(bal) AS BIGINT),
      |  count(DISTINCT note) FROM base
      |UNION ALL
      |SELECT 3, -1, count(*), CAST(sum(bal) AS BIGINT),
      |  CAST(sum(k) AS BIGINT)
      |FROM s4 WHERE bal BETWEEN 100000 AND 500000
      |UNION ALL
      |SELECT 4, -1, 1, 1, 0""".stripMargin

  val queries: Map[String, Q] = Map(
    "q238_column_mapping" -> (q238ColumnMapping _),
    "q237_cdc_feed" -> (q237CdcFeed _),
    "q233_stream_table_write" -> (q233StreamTableWrite _),
    "q234_sql_restore" -> (q234SqlRestore _),
    "q235_table_changes" -> (q235TableChanges _),
    "q236_exists_dml" -> (q236ExistsDml _),
    "q172_join_ivm" -> (q172JoinIvm _),
    "q173_cdf_join_ivm" -> (q173CdfJoinIvm _),
    "q165_delete_vectors" -> (q165DeleteVectors _),
    "q166_schema_evolution" -> (q166SchemaEvolution _),
    "q107_cdc_merge" -> (q107CdcMerge _),
    "q108_streaming_cdc" -> (q108StreamingCdc _),
    "q90_snapshot_diff" -> (q90SnapshotDiff _),
    "q89_time_travel" -> (q89TimeTravel _),
    "q204_snapshot_stats_prune" -> (q204SnapshotStatsPrune _),
    "q209_sql_time_travel" -> (q209SqlTimeTravel _),
    "q210_sql_stats_prune" -> (q210SqlStatsPrune _),
    "q211_sql_insert" -> (q211SqlInsert _),
    "q218_sql_delete" -> (q218SqlDelete _),
    "q219_sql_merge" -> (q219SqlMerge _),
    "q221_sql_merge_general" -> (q221SqlMergeGeneral _),
    "q222_sql_update" -> (q222SqlUpdate _),
    "q227_merge_by_source" -> (q227MergeBySource _),
    "q228_sql_ddl" -> (q228SqlDdl _),
    "q229_merge_evolution" -> (q229MergeEvolution _),
    "q230_sql_optimize" -> (q230SqlOptimize _),
    "q231_subquery_update" -> (q231SubqueryUpdate _),
    "q232_general_delete" -> (q232GeneralDelete _),
    "q223_cdf_stream" -> (q223CdfStream _),
    "q224_history" -> (q224History _),
    "q225_sql_truncate" -> (q225SqlTruncate _),
    "q226_insert_overwrite" -> (q226InsertOverwrite _),
    "q213_schema_evolution" -> (q213SchemaEvolution _),
    "q71_stream_stream_join" -> (q71StreamStreamJoin _),
    "q202_bloom_skipping" -> (q202BloomSkipping _),
    "q203_stream_outer_join" -> (q203StreamOuterJoin _),
    "q206_stream_full_outer_join" -> (q206StreamFullOuterJoin _),
    "q207_dedup_within_watermark" -> (q207DedupWithinWatermark _),
    "q43_lake_roundtrip" -> (q43LakeRoundtrip _),
    "q44_streaming_window" -> (q44StreamingWindow _),
    "q55_streaming_sessions" -> (q55StreamingSessions _),
    "q66_stream_enrich" -> (q66StreamEnrich _),
    "q84_orc_roundtrip" -> (q84OrcRoundtrip _))

  val oracleSql: Map[String, String] = Map(
    "q238_column_mapping" -> q238Sql,
    "q237_cdc_feed" -> q237Sql,
    "q233_stream_table_write" -> q233Sql,
    "q234_sql_restore" -> q234Sql,
    "q235_table_changes" -> q235Sql,
    "q236_exists_dml" -> q236Sql,
    "q172_join_ivm" -> q172Sql,
    "q173_cdf_join_ivm" -> q173Sql,
    "q165_delete_vectors" -> q165Sql,
    "q166_schema_evolution" -> q166Sql,
    "q107_cdc_merge" -> q107Sql,
    "q108_streaming_cdc" -> q108Sql,
    "q71_stream_stream_join" -> q71Sql,
    "q202_bloom_skipping" -> q202Sql,
    "q203_stream_outer_join" -> q203Sql,
    "q206_stream_full_outer_join" -> q206Sql,
    "q207_dedup_within_watermark" -> q207Sql,
    "q43_lake_roundtrip" -> q43Sql,
    "q44_streaming_window" -> q44Sql,
    "q55_streaming_sessions" -> q55Sql,
    "q66_stream_enrich" -> q66Sql,
    "q84_orc_roundtrip" -> q84Sql,
    "q89_time_travel" -> q89Sql,
    "q90_snapshot_diff" -> q90Sql,
    "q204_snapshot_stats_prune" -> q204Sql,
    "q209_sql_time_travel" -> q209Sql,
    "q210_sql_stats_prune" -> q210Sql,
    "q211_sql_insert" -> q211Sql,
    "q218_sql_delete" -> q218Sql,
    "q219_sql_merge" -> q219Sql,
    "q221_sql_merge_general" -> q221Sql,
    "q222_sql_update" -> q222Sql,
    "q227_merge_by_source" -> q227Sql,
    "q228_sql_ddl" -> q228Sql,
    "q229_merge_evolution" -> q229Sql,
    "q230_sql_optimize" -> q230Sql,
    "q231_subquery_update" -> q231Sql,
    "q232_general_delete" -> q232Sql,
    "q223_cdf_stream" -> q223Sql,
    "q224_history" -> q224Sql,
    "q225_sql_truncate" -> q225Sql,
    "q226_insert_overwrite" -> q226Sql,
    "q213_schema_evolution" -> q213Sql)
}
