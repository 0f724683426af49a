package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analytics over per-user event streams: the transition
  * matrix (which event type follows which) and the most common opening
  * paths — the "how do users move through the product" view next to
  * [[Funnel]]'s "do they finish" and [[Retention]]'s "do they come back".
  * Completes the event-log analytics family over the reference's
  * activity-stream shape (hourly event batches, `storage/handlers/`
  * ingest outputs keyed by entity + timestamp).
  *
  * Scale design: both shapes shuffle the event stream ONCE, on the user
  * key. `transitions` sequences each user with a lag window (per-row
  * state = one previous value), then pair-counts with map-side partial
  * aggregation — the pair relation is at most |types|² rows, and the
  * per-prev totals it joins against are derived from that already-tiny
  * relation (broadcast-sized by construction). `topPaths` bounds per-user
  * state to the first `pathLen` events (row_number filter BEFORE the
  * collect), so no full per-user history is ever materialized; the path
  * count relation is path-cardinality and its global top-k is a
  * TakeOrderedAndProject over an aggregated (small) input, not a global
  * sort of facts.
  */
object Paths {

  /** Per-(prev, next) transition counts with the within-prev share:
    * (prev_type, event_type, n_transitions, share_r). Ordering within a
    * user is (tsCol, tieCol) — the tiebreak keeps simultaneous events
    * deterministic, as every windowed operator in this repo requires.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = pairs
      .groupBy(col("prev_type"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n_transitions")).as("tot"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n_transitions"),
        round(col("n_transitions") / col("tot").cast("double"), 9).as("share_r"))
  }

  /** The `k` most common opening paths (first `pathLen` event types per
    * user, joined with " > "): (path, n_users, share_r) where share_r is
    * the fraction of all path-holding users. Ties at position k broken by
    * path string — deterministic total order.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, pathLen: Int, k: Int): DataFrame = {
    require(pathLen > 0 && k > 0)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val paths = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= pathLen)           // bound state BEFORE collecting
      .groupBy(col(userCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col(typeCol).as("t")))),
        x => x.getField("t")), " > ").as("path"))
    val counts = paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
    val total = paths.agg(count(lit(1)).as("tot"))
    counts.crossJoin(broadcast(total))
      .select(col("path"), col("n_users"),
        round(col("n_users") / col("tot").cast("double"), 9).as("share_r"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }
}
