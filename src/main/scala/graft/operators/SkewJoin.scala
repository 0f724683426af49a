package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (large) side, replicate
  * the other side across the salt domain, join on (key, salt).
  *
  * This is the manual fallback for skews AQE's skew-join split cannot reach
  * (e.g. a single hot key inside an aggregation-feeding join). On this
  * engine AQE (`spark.sql.adaptive.skewJoin`) is the first line of defense;
  * `saltedEquiJoin` is the deterministic, always-available second.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, with `left` salted into
    * `saltFactor` sub-partitions per key and `right` replicated saltFactor×.
    * Result is exactly the unsalted join's rows.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // any salt assignment is correct (the right side is fully replicated),
    // but it must be DETERMINISTIC per row: a nondeterministic salt (random,
    // monotonically_increasing_id) feeding a shuffle key loses/duplicates
    // rows when a map task is recomputed after partial fetch (SPARK-23207
    // class of bug). Hash the full row instead — identical rows land on the
    // same reducer, which is harmless.
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
