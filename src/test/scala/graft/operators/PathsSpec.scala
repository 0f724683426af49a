package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analytics (Paths) + the per-group cap (Assembly.capPerGroup). */
class PathsSpec extends SparkTestBase {
  import spark.implicits._

  // user 1: a → b → a ; user 2: a → b ; user 3: b (no transition)
  private val events = Seq(
    (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "a"),
    (4L, 10L, 2L, "a"), (5L, 20L, 2L, "b"),
    (6L, 10L, 3L, "b")
  ).toDF("event_id", "ts_ns", "user_id", "event_type")
    .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))

  test("transitions: hand-computed pair counts and within-prev shares") {
    val rows = Paths.transitions(events, "user_id", "ts_ns", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a→b twice (users 1, 2), b→a once (user 1); user 3 contributes nothing
    assert(rows === Map(
      ("a", "b") -> ((2L, 1.0)),   // all of a's outgoing mass
      ("b", "a") -> ((1L, 1.0))))  // all of b's outgoing mass
  }

  test("transitions: tiebreak column orders simultaneous events deterministically") {
    // same ts for both events — order must come from event_id
    val simul = Seq((1L, 10L, 100L, "x"), (2L, 10L, 100L, "y"))
      .toDF("event_id", "ts_ns", "user_id", "event_type")
    val rows = Paths.transitions(simul, "user_id", "ts_ns", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("x", "y")))
  }

  test("topPaths: bounded opening paths with global shares") {
    val rows = Paths.topPaths(events, "user_id", "ts_ns", "event_id", "event_type",
      pathLen = 2, k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 1 and 2 both open "a > b"; user 3 opens "b" (shorter than pathLen)
    assert(rows === Map(
      "a > b" -> ((2L, round(2.0 / 3, 9))),
      "b" -> ((1L, round(1.0 / 3, 9)))))
  }

  test("topPaths: k cuts with a deterministic (count, path) tie order") {
    val top1 = Paths.topPaths(events, "user_id", "ts_ns", "event_id", "event_type",
      pathLen = 2, k = 1).collect()
    assert(top1.map(_.getString(0)).toSeq === Seq("a > b"))
  }

  private def round(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("capPerGroup ≡ the window idiom, with at most k rows per group") {
    val docs = (1L to 40L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val capped = Assembly.capPerGroup(docs, "grp", "doc_id", k = 5)
    val sizes = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ === 5L) && sizes.size === 3)
    // same keep-set as row_number over (grp order by md5-priority, id)
    val w = Window.partitionBy(col("grp"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc, col("doc_id").asc)
    val viaWindow = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("doc_id").as[Long].collect().toSet
    assert(capped.select("doc_id").as[Long].collect().toSet === viaWindow)
  }
}
