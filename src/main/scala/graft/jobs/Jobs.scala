package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Lake

/** Job entry points mirroring the reference's three pipelines (SURVEY §3):
  * bulk backfill (quantdl-storage), daily incremental update
  * (quantdl-update), and year consolidation. One Spark job per workflow —
  * the reference's thread pools and bounded queues become partitioned tasks.
  */
object Jobs {

  /** §3.1 backfill: bars (security_id, date, OHLCV) → entity/year-partitioned
    * lake + manifest.
    */
  def backfillDailyTicks(spark: SparkSession, bars: DataFrame, root: String): Unit = {
    val withYear = bars.withColumn("year", year(col("date")))
    Lake.overwritePartitions(withYear, root, "daily_ticks", Seq("security_id", "year"))
    Lake.writeManifest(spark, root, "daily_ticks",
      rowCount = Lake.read(spark, root, "daily_ticks").count(),
      version = "1",
      extra = Map("export_kind" -> "backfill"))
  }

  /** §3.2 step 3 / I3: idempotent refresh of the partitions covered by the
    * incoming month-to-date slice — a total overwrite of exactly those
    * partitions, no merge logic (update/app.py:296-445).
    */
  def updateDailyTicks(spark: SparkSession, monthToDate: DataFrame, root: String): Unit = {
    val withYear = monthToDate.withColumn("year", year(col("date")))
    Lake.overwritePartitions(withYear, root, "daily_ticks", Seq("security_id", "year"))
  }

  /** §3.2 step 6 / I4: append only unseen accessions (the reference's
    * anti-join on accession_number before concat, update/app.py:877-940).
    */
  def appendNewFilings(spark: SparkSession, incoming: DataFrame, root: String,
      table: String, keyCol: String): Long = {
    val exists = Lake.partitionExists(spark, root, table, "")
    val unseen = if (!exists) incoming else {
      val existing = Lake.read(spark, root, table).select(col(keyCol)).distinct()
      incoming.join(existing, Seq(keyCol), "left_anti")
    }
    val n = unseen.count()
    if (n > 0) unseen.write.mode("append").parquet(s"$root/$table")
    n
  }

  /** I5 year consolidation with a `force` guard mirroring the reference's
    * already-consolidated check (consolidate/cli.py:4-46).
    */
  def consolidateYear(spark: SparkSession, root: String, yr: Int,
      force: Boolean = false): Boolean = {
    val manifest = Lake.readManifest(spark, root, "daily_ticks")
    val done = manifest.get("consolidated_years").exists(_.split(",").contains(yr.toString))
    if (done && !force) return false
    Lake.compactYears(spark, root, "daily_ticks", Seq(yr))
    val years = (manifest.get("consolidated_years").toSeq.flatMap(_.split(",").filter(_.nonEmpty)) :+ yr.toString)
      .distinct.sorted.mkString(",")
    // carry forward previously recorded metadata (export_kind etc.) —
    // writeManifest replaces the sidecar wholesale
    val carried = manifest -- Seq("table", "row_count", "version")
    Lake.writeManifest(spark, root, "daily_ticks",
      rowCount = Lake.read(spark, root, "daily_ticks").count(),
      version = "1",
      extra = carried + ("consolidated_years" -> years))
    true
  }
}
