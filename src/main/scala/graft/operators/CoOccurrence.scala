package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: item pairs that appear together in
  * the same basket (order, document, session), with support counts and
  * association-rule strength (confidence / lift).
  *
  * Scale posture: the pair generator is an equi-self-join on the basket
  * key, so per-basket fan-out is C(basket_size, 2) — bounded by the
  * largest basket (TPC-H orders: ≤ 7 lines → ≤ 21 pairs), NOT by corpus
  * size. Shuffle is one hash partition on the basket key plus one on the
  * (x, y) pair — both linear in pair instances. No driver-side state; the
  * n_baskets scalar rides along as a broadcast-joined 1-row frame.
  *
  * Lift/confidence are emitted micro-rounded from IEEE-double arithmetic
  * over exact BIGINT counts (identical-op-order ⇒ engine-identical), with
  * the exact counts alongside so the oracle hash pins the integers too.
  */
object CoOccurrence {

  private def pairsFrom(baskets: DataFrame): DataFrame =
    baskets.as("a")
      .join(baskets.as("b"),
        col("a.__g") === col("b.__g") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("x"), col("b.__i").as("y"))
      .agg(count(lit(1)).as("support"))

  /** Distinct co-occurring item pairs (x < y) per basket with support =
    * number of distinct baskets containing both.
    */
  def pairCounts(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    pairsFrom(
      df.select(col(basketCol).as("__g"), col(itemCol).as("__i")).distinct())

  /** Pairs meeting a minimum support threshold. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    pairCounts(df, basketCol, itemCol).filter(col("support") >= minSupport)

  /** Association rules over frequent pairs: for each unordered frequent
    * pair {x, y} emit both counts and micro-rounded strength metrics:
    *
    *  - `support`          — baskets containing both x and y (exact)
    *  - `x_count`/`y_count` — baskets containing each item (exact)
    *  - `conf_xy_micro`    — round(1e6 · support / x_count)  (x ⇒ y)
    *  - `conf_yx_micro`    — round(1e6 · support / y_count)  (y ⇒ x)
    *  - `lift_micro`       — round(1e6 · n · support / (x_count · y_count))
    *
    * Lift > 1e6 micro means the pair co-occurs more than independence
    * predicts. All divisions are double over exact longs in a fixed
    * operation order, so the micro values replay bit-exact in SQL.
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val baskets = df.select(col(basketCol).as("__g"), col(itemCol).as("__i")).distinct()
    val itemCounts = baskets.groupBy(col("__i")).agg(count(lit(1)).as("__ic"))
    // single global scalar — broadcast 1-row frame, never a collect
    val n = baskets.select(countDistinct(col("__g")).as("__n"))
    val pairs = pairsFrom(baskets).filter(col("support") >= minSupport)
    val d = (c: Column) => c.cast("double")
    pairs
      .join(broadcast(itemCounts).withColumnRenamed("__i", "x")
        .withColumnRenamed("__ic", "x_count"), Seq("x"))
      .join(broadcast(itemCounts).withColumnRenamed("__i", "y")
        .withColumnRenamed("__ic", "y_count"), Seq("y"))
      .crossJoin(broadcast(n))
      .select(
        col("x"), col("y"), col("support"), col("x_count"), col("y_count"),
        round(d(col("support")) / d(col("x_count")) * 1e6).cast("long")
          .as("conf_xy_micro"),
        round(d(col("support")) / d(col("y_count")) * 1e6).cast("long")
          .as("conf_yx_micro"),
        round(d(col("__n")) * d(col("support")) /
          (d(col("x_count")) * d(col("y_count"))) * 1e6).cast("long")
          .as("lift_micro"))
  }
}
