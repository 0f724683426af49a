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
  * lookup is a broadcast join against fact tables; the ID-assignment window
  * runs once, at build time, over a single ordered partition (fine at
  * dimension scale, never applied to fact data).
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

    // Dimension-build-time window: single partition, total order.
    val w = Window.orderBy(col("permno"), col("start_date"), col("symbol"))

    val flagged = periods
      .withColumn("prev_permno", lag(col("permno"), 1).over(w))
      .withColumn("prev_symbol", lag(col("symbol"), 1).over(w))
      .withColumn("prev_ciks", lag(col("ciks"), 1).over(w))
      .withColumn("cik_overlap",
        coalesce(arrays_overlap(col("ciks"), col("prev_ciks")), lit(false)))
      .withColumn("new_business",
        col("prev_permno").isNull ||
          col("permno") =!= col("prev_permno") ||
          (col("symbol") =!= col("prev_symbol") && !col("cik_overlap")))
      .withColumn("security_id",
        lit(BaseId) + sum(col("new_business").cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("permno"), col("symbol"), col("security_id"))

    cikCusip.join(flagged, Seq("permno", "symbol"), "left")
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
  def resolveExact(df: DataFrame, master: DataFrame,
      symbolCol: String = "symbol", dayCol: String = "day"): DataFrame = {
    val m = master.select(
      col("symbol").as("__m_symbol"),
      col("start_date").as("__m_start"),
      col("end_date").as("__m_end"),
      col("security_id").as("__m_sid"))
    // Preserve input CARDINALITY without a full-table sort: collapse to
    // distinct probes WITH their multiplicity (one shuffle, no window sort),
    // resolve the distinct rows through the broadcast join, then re-expand
    // by the recorded count. A bare groupBy would merge genuinely duplicate
    // fact rows (two identical trades) into one.
    val counted = df.groupBy(df.columns.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counted.join(broadcast(m),
        col(symbolCol) === col("__m_symbol") &&
          col(dayCol).between(col("__m_start"), col("__m_end")),
        "left")
      .groupBy((df.columns :+ "__n").map(col): _*)
      .agg(min(col("__m_sid")).as("security_id"))
      .withColumn("__dup", explode(sequence(lit(1L), col("__n"))))
      .drop("__n", "__dup")
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
    // The exact result feeds three consumers (hit branch, miss branch, and
    // the existence check) — persist it so the broadcast interval join runs
    // once, not three times.
    val exact = resolveExact(df, master, symbolCol, dayCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hit = exact.filter(col("security_id").isNotNull)
    val miss = exact.filter(col("security_id").isNull).drop("security_id")
    if (miss.isEmpty) return exact

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

    val pick = Window.partitionBy(miss.columns.map(col): _*)
      .orderBy(col("distance").asc, col("security_id").asc)
    val fuzzy = candidates
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(miss.columns.map(col) :+ col("security_id"): _*)

    val fuzzyAll = miss.join(fuzzy, miss.columns.toSeq, "left")
    hit.unionByName(fuzzyAll)
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
    val added = snapshot
      .join(existingKeys, Seq("symbol", "cik"), "left_anti")
      .crossJoin(broadcast(maxSid))
      .withColumn("security_id",
        col("m") + row_number().over(Window.orderBy(col("symbol"), col("cik"))))
      .select(
        col("security_id"),
        lit(null).cast("int").as("permno"),
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
