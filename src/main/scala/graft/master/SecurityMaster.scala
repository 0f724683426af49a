package graft.master

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The temporal SecurityMaster: SCD-2 dimension mapping (symbol, day) →
  * security_id across renames / mergers / delistings.
  *
  * Reference semantics: master/security_master.py —
  *  - business-continuity ID assignment (:524-638): new security_id iff
  *    PERMNO changes, or symbol changes with NO CIK overlap vs the adjacent
  *    prior period of the same PERMNO;
  *  - `get_security_id` exact interval lookup (:731-760);
  *  - `auto_resolve` fuzzy temporal resolution (:640-729).
  *
  * Scale posture: the master is a small dimension (~50k-500k rows) — every
  * lookup is a broadcast join against fact tables; dense ID assignment uses
  * the distributed two-phase prefix sum ([[graft.operators.GlobalOrder]]),
  * so even the build step has no single-partition window.
  */
object SecurityMaster {

  private val BaseId = 1000L

  /** Symbol normalization at the boundary (reference security_master.py:157-175):
    * uppercase, drop '.'/'-' class separators (BRK.B → BRKB).
    */
  def normalizeSymbol(c: Column): Column =
    upper(regexp_replace(c, "[.\\-]", ""))

  /** 10-digit zero-padded CIK (reference security_master.py:1335). */
  def normalizeCik(c: Column): Column = lpad(c.cast("string"), 10, "0")

  /** Assign security_ids over name-history rows.
    *
    * Input: (permno, symbol, company, cik, cusip, start_date, end_date) —
    * one row per (permno, symbol, cik-period).
    * Output: input rows + security_id.
    *
    * Mirrors reference security_map (security_master.py:524-638):
    * 1. collapse to (permno, symbol) periods, collecting ALL ciks;
    * 2. order by (permno, start_date) [we add symbol for a total order —
    *    SURVEY §7.5 risk 3: determinism requires a total ordering];
    * 3. new_business = first row ∨ permno change ∨ (symbol change ∧ no CIK
    *    overlap with previous period);
    * 4. security_id = 1000 + running count of new_business;
    * 5. join IDs back to the original rows on (permno, symbol).
    */
  def assignSecurityIds(cikCusip: DataFrame): DataFrame = {
    val periods = cikCusip
      .groupBy(col("permno"), col("symbol"))
      .agg(
        sort_array(collect_set(col("cik"))).as("ciks"),
        min(col("start_date")).as("start_date"),
        max(col("end_date")).as("end_date"))

    // The new-business flag compares CONSECUTIVE rows in (permno,
    // start_date, symbol) order, but a permno change always starts a new
    // business — so a window partitioned by permno sees exactly the prev
    // rows that matter (the first row of each permno is new by the isNull
    // branch). No global window needed for the flags.
    val w = Window.partitionBy(col("permno")).orderBy(col("start_date"), col("symbol"))

    val flagged = periods
      .withColumn("prev_symbol", lag(col("symbol"), 1).over(w))
      .withColumn("prev_ciks", lag(col("ciks"), 1).over(w))
      .withColumn("cik_overlap",
        coalesce(arrays_overlap(col("ciks"), col("prev_ciks")), lit(false)))
      .withColumn("new_business",
        col("prev_symbol").isNull ||
          (col("symbol") =!= col("prev_symbol") && !col("cik_overlap")))

    // Dense sequential IDs over the global order — two-phase distributed
    // prefix sum (graft.operators.GlobalOrder), no single-partition window.
    val withId = graft.operators.GlobalOrder.runningSum(
        flagged, Seq("permno", "start_date", "symbol"),
        col("new_business").cast("long"), "__run")
      .withColumn("security_id", lit(BaseId) + col("__run"))
      .select(col("permno"), col("symbol"), col("security_id"))

    cikCusip.join(withId, Seq("permno", "symbol"), "left")
      .select(
        col("security_id"),
        col("permno"), col("symbol"), col("company"), col("cik"),
        col("cusip"), col("start_date"), col("end_date"))
  }

  /** Bulk exact lookup (J1): attach security_id to (symbol, day) rows via a
    * broadcast interval-containment join. `symbolCol`/`dayCol` name columns
    * of `df`; ambiguous matches resolve to the smallest security_id
    * (deterministic stand-in for the reference's head(1),
    * security_master.py:753).
    */
  /** Resolve DISTINCT (symbol, day) keys through the broadcast interval
    * join. Input must be unique on (symbolCol, dayCol); output adds
    * `security_id` (null = no exact match), exactly one row per key.
    */
  private def resolveExactKeys(keys: DataFrame, master: DataFrame,
      symbolCol: String, dayCol: String): DataFrame = {
    val m = master.select(
      col("symbol").as("__m_symbol"),
      col("start_date").as("__m_start"),
      col("end_date").as("__m_end"),
      col("security_id").as("__m_sid"))
    keys.join(broadcast(m),
        col(symbolCol) === col("__m_symbol") &&
          col(dayCol).between(col("__m_start"), col("__m_end")),
        "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(col("__m_sid")).as("security_id"))
  }

  def resolveExact(df: DataFrame, master: DataFrame,
      symbolCol: String = "symbol", dayCol: String = "day"): DataFrame = {
    // Resolution depends only on (symbol, day): resolve the DISTINCT probe
    // keys (a far smaller relation than the fact table), then join the
    // resolved map back. Input cardinality is preserved because the map is
    // unique per key; the map-back join is AQE-broadcastable whenever the
    // probe key space is dimension-sized.
    val keys = df.select(col(symbolCol), col(dayCol)).distinct()
    df.join(resolveExactKeys(keys, master, symbolCol, dayCol),
      Seq(symbolCol, dayCol), "left")
  }

  /** Bulk fuzzy resolution (J2, reference auto_resolve security_master.py:640-729):
    * for (symbol, day) pairs with no exact interval match, consider every
    * security that EVER used the symbol, keep those active on `day` under any
    * symbol, and pick the one whose symbol-usage interval is temporally
    * closest to `day` (distance = days outside [usage_start, usage_end]);
    * ties break to the smallest security_id.
    *
    * Returns df + security_id (null where even fuzzy resolution fails).
    */
  def resolve(df: DataFrame, master: DataFrame,
      symbolCol: String = "symbol", dayCol: String = "day"): DataFrame = {
    // Resolve at probe-key granularity: distinct (symbol, day) keys flow
    // through the exact interval join, only the exact MISSES continue into
    // the fuzzy candidate machinery, and the final key→sid map joins back
    // to the fact rows once. The fact table is touched exactly twice
    // (distinct + map-back join) regardless of how much fuzzy work happens.
    val keys = df.select(col(symbolCol), col(dayCol)).distinct()
    // The exact result feeds the hit and miss branches; the consumers see
    // an IDENTICAL subtree (distinct → broadcast interval join → groupBy),
    // so ReusedExchange/ReusedQueryStage dedups the computation at
    // execution — an eager checkpoint here paid one extra blocking job per
    // resolve for nothing (measured on q45).
    val exact = resolveExactKeys(keys, master, symbolCol, dayCol)
    val hit = exact.filter(col("security_id").isNotNull)
    val miss = exact.filter(col("security_id").isNull).drop("security_id")

    // Symbol-usage interval per (security_id, symbol): min/max over its rows
    // (reference takes head(1); usage rows per (sid,symbol) are contiguous).
    val usage = master.groupBy(col("security_id"), col("symbol"))
      .agg(min(col("start_date")).as("u_start"), max(col("end_date")).as("u_end"))
      .withColumnRenamed("symbol", "__u_symbol")

    // Activity intervals per security (any symbol).
    val activity = master.select(
      col("security_id"), col("start_date").as("a_start"), col("end_date").as("a_end"))

    val candidates = miss
      .join(broadcast(usage), col(symbolCol) === col("__u_symbol"), "inner")
      .join(broadcast(activity), Seq("security_id"), "inner")
      .filter(col(dayCol).between(col("a_start"), col("a_end")))
      .withColumn("distance",
        when(col(dayCol) < col("u_start"), datediff(col("u_start"), col(dayCol)))
          .when(col(dayCol) > col("u_end"), datediff(col(dayCol), col("u_end")))
          .otherwise(0))

    val pick = Window.partitionBy(col(symbolCol), col(dayCol))
      .orderBy(col("distance").asc, col("security_id").asc)
    val fuzzy = candidates
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(symbolCol), col(dayCol), col("security_id"))

    val resolvedKeys = hit.unionByName(
      miss.join(fuzzy, Seq(symbolCol, dayCol), "left"))
    df.join(resolvedKeys, Seq(symbolCol, dayCol), "left")
  }

  /** Symbol history for one security (reference get_symbol_history,
    * security_master.py:762-779): per symbol, min(start)/max(end).
    */
  def symbolHistory(master: DataFrame, sid: Long): DataFrame =
    master.filter(col("security_id") === sid)
      .groupBy(col("symbol"))
      .agg(min(col("start_date")).as("start_date"), max(col("end_date")).as("end_date"))

  /** I7 — SCD-2 daily maintenance from a (symbol, cik, company) snapshot
    * (reference update_from_sec, security_master.py:894-980):
    *  1. existing (symbol, cik) rows still present in the snapshot with a
    *     stale end_date are EXTENDED to `asOf`;
    *  2. snapshot rows absent from the master are ADDED as new securities
    *     with ids continuing after max(security_id), [asOf, asOf] validity,
    *     null permno/cusip (the schema-evolving diagonal concat, U2).
    * New ids are assigned in (symbol, cik) order for determinism.
    */
  def applySnapshot(master: DataFrame, snapshot0: DataFrame, asOf: java.sql.Date): DataFrame = {
    // SEC snapshots can repeat (symbol, cik) pairs — dedup or the extension
    // join below would fan out master rows (duplicate SCD intervals).
    val snapshot = snapshot0
      .groupBy(col("symbol"), col("cik"))
      .agg(min(col("company")).as("company"))
    val snapKeys = snapshot.select(
      col("symbol").as("__s_symbol"), col("cik").as("__s_cik"))
    val extended = master
      .join(broadcast(snapKeys),
        col("symbol") === col("__s_symbol") && col("cik") === col("__s_cik"), "left")
      .withColumn("end_date",
        when(col("__s_symbol").isNotNull && col("end_date") < lit(asOf), lit(asOf))
          .otherwise(col("end_date")))
      .drop("__s_symbol", "__s_cik")

    val existingKeys = master.select(col("symbol"), col("cik")).distinct()
    val maxSid = master.agg(coalesce(max(col("security_id")), lit(BaseId)).as("m"))
    val newRows = graft.operators.GlobalOrder.runningRowNumber(
      snapshot.join(existingKeys, Seq("symbol", "cik"), "left_anti"),
      Seq("symbol", "cik"), "__rn")
    val added = newRows
      .crossJoin(broadcast(maxSid))
      .withColumn("security_id", col("m") + col("__rn"))
      .select(
        col("security_id"),
        lit(null).cast("long").as("permno"),
        col("symbol"), col("company"), col("cik"),
        lit(null).cast("string").as("cusip"),
        lit(asOf).as("start_date"), lit(asOf).as("end_date"))

    extended.unionByName(added, allowMissingColumns = true)
  }

  /** J10 — rebrand stitching: disappeared × appeared securities matched on
    * equal share-class FIGI (reference security_master.py:1105-1136). Both
    * inputs carry (security_id | symbol, figi); output pairs are rename
    * continuations, not delistings.
    */
  def rebrandMatches(disappeared: DataFrame, appeared: DataFrame): DataFrame =
    disappeared.select(col("symbol").as("old_symbol"), col("figi"))
      .join(appeared.select(col("symbol").as("new_symbol"), col("figi")), Seq("figi"))
      .select(col("old_symbol"), col("new_symbol"), col("figi"))

  /** I7 — 14-day delist grace (reference security_master.py:1198-1410):
    * disappeared symbols younger than `graceDays` are retained (possible
    * data lag), older ones are confirmed delists.
    */
  def confirmedDelists(disappeared: DataFrame, asOf: java.sql.Date,
      graceDays: Int = 14): DataFrame =
    disappeared.filter(datediff(lit(asOf), col("end_date")) > graceDays)
}
