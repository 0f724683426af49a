package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for an ordered list of
  * stages (event types), count the users who reached each stage IN ORDER —
  * stage i+1 counts only events strictly after the user's stage-i time and
  * within `windowNs` of their stage-0 entry — plus the mean time-to-stage.
  *
  * Scale design: each stage is one equi-join on the user key against the
  * previous stage's per-user row (user-cardinality, not event-cardinality)
  * followed by a partial-aggregated min — no window over the event stream,
  * no per-user event collection. All stage relations hash-partition by
  * user, so consecutive stages reuse the exchange under AQE. Time math is
  * integer epoch-nanos end to end; the only float op is the final
  * mean division (one fixed IEEE chain, oracle-replayable).
  *
  * For funnels with many stages, materialize the intermediate stage
  * frames ([[Materialize.once]] — released by the ContextCleaner, unlike
  * persist) — each union branch otherwise re-derives its prefix chain.
  */
object Funnel {

  /** Per-stage rollup: (stage_idx, stage, n_users, mean_hours_r) where
    * mean_hours_r is the mean nanos from stage-0 entry to this stage,
    * in hours rounded to 6dp (0.0 for stage 0).
    */
  /** The per-user stage frames: element i holds (u, t0, t_prev) for every
    * user who reached stage i in order — t0 = stage-0 entry time, t_prev =
    * time this stage was reached.
    */
  private def stageFrames(events: DataFrame, userCol: String,
      typeCol: String, tsNsCol: String, stages: Seq[String],
      windowNs: Long): Seq[DataFrame] = {
    require(stages.nonEmpty, "at least one funnel stage")
    val base = events
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        col(tsNsCol).cast("long").as("t"))
    val s0 = base.filter(col("et") === stages.head)
      .groupBy(col("u"))
      .agg(min(col("t")).as("t0"))
      .withColumn("t_prev", col("t0"))
    stages.tail.scanLeft(s0) { (prev, st) =>
      base.filter(col("et") === st)
        .join(prev.select(col("u"), col("t0"), col("t_prev")), Seq("u"))
        .filter(col("t") > col("t_prev") && col("t") <= col("t0") + windowNs)
        .groupBy(col("u"))
        .agg(min(col("t0")).as("t0"), min(col("t")).as("t_prev"))
    }
  }

  /** Per-user completion frame: one row (u, t0, t_prev) per user who
    * reached the LAST stage in order — the composable form (join it back
    * to cohorts, sessions, …); [[report]] is its rollup.
    */
  def completions(events: DataFrame, userCol: String, typeCol: String,
      tsNsCol: String, stages: Seq[String], windowNs: Long): DataFrame =
    stageFrames(events, userCol, typeCol, tsNsCol, stages, windowNs).last

  def report(events: DataFrame, userCol: String, typeCol: String,
      tsNsCol: String, stages: Seq[String], windowNs: Long): DataFrame = {
    val chain = stageFrames(events, userCol, typeCol, tsNsCol, stages, windowNs)
    chain.zip(stages).zipWithIndex.map { case ((df, st), i) =>
      df.agg(
          count(lit(1)).as("n_users"),
          // decimal(38,0) sum: |delta| ≤ windowNs but the SUM over a
          // 100×-scale user base overflows int64 (found by ScaleStress at
          // x30) — exact decimal matches the oracle's HUGEINT sum
          coalesce(sum((col("t_prev") - col("t0")).cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO)).as("__sum_ns"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
          col("n_users"),
          when(col("n_users") === 0L, lit(0.0))
            .otherwise(round(
              col("__sum_ns").cast("double") / col("n_users") / lit(3.6e12), 6))
            .as("mean_hours_r"))
    }.reduce(_.union(_))
  }
}
