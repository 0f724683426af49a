package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RRF: hand-computed fusion, missing-list handling, deterministic ties. */
class HybridSearchSpec extends SparkTestBase {
  import spark.implicits._

  test("fusion matches hand-computed reciprocal ranks") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (2L, 2L), (4L, 3L)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(a, b), "id", "rank", k = 60)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    def c(r: Long) = math.round(1e6 / (60 + r))
    assert(out === Seq(
      (3L, c(3) + c(1), 2L, 1L), // 15873+16393 = 32266
      (2L, c(2) + c(2), 2L, 2L), // 32258
      (1L, c(1), 1L, 3L),
      (4L, c(3), 1L, 4L)))
  }

  test("equal scores break ties toward the lower id") {
    val a = Seq((9L, 1L)).toDF("id", "rank")
    val b = Seq((5L, 1L)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(a, b), "id", "rank")
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(5L, 9L))
    assert(out.map(_._2).distinct.size === 1)
  }

  test("single-list fusion preserves the input order") {
    val a = Seq((7L, 1L), (8L, 2L), (9L, 3L)).toDF("id", "rank")
    val out = HybridSearch.rrf(Seq(a), "id", "rank")
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(7L, 8L, 9L))
    assert(out.forall(_._3 == 1L))
  }
}
