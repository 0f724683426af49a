package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort-retention analysis: bucket users by the time period of their
  * FIRST event (epoch-aligned fixed-width buckets — no calendar math, so
  * the bucketing is pure integer division and engine-portable), then for
  * each (cohort, offset) count how many of the cohort's users were active
  * `offset` periods after entry.
  *
  * Scale design: two aggregations on the user key (first-event, then
  * per-(cohort, offset) distinct users) plus one user-keyed equi-join —
  * event rows are never windowed or collected; the cohort table is
  * user-cardinality. The distinct-count shuffle key is (cohort, offset,
  * user), so partial aggregation dedups map-side.
  */
object Retention {

  /** Per-(cohort, offset) retention: (cohort_bucket, bucket_offset,
    * n_active, n_cohort, retention_r). `bucketNs` is the cohort width in
    * nanoseconds (e.g. 7 days). `tsNsCol` must be epoch-nanos (long).
    */
  def report(events: DataFrame, userCol: String, tsNsCol: String,
      bucketNs: Long): DataFrame = {
    val e = events.select(col(userCol).as("u"),
      expr(s"$tsNsCol div $bucketNs").as("bk"))
    val cohort = e.groupBy(col("u")).agg(min(col("bk")).as("cb"))
    val sizes = cohort.groupBy(col("cb")).agg(count(lit(1)).as("n_cohort"))
    e.join(cohort, Seq("u"))
      .groupBy(col("cb"), (col("bk") - col("cb")).as("bucket_offset"))
      .agg(countDistinct(col("u")).as("n_active"))
      .join(sizes, Seq("cb"))
      .select(col("cb").as("cohort_bucket"), col("bucket_offset"),
        col("n_active"), col("n_cohort"),
        round(col("n_active") / col("n_cohort").cast("double"), 9)
          .as("retention_r"))
  }
}
