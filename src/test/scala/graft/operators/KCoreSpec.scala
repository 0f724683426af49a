package graft.operators

import graft.SparkTestBase

/** Fixed-round k-core peeling: cascades, cliques, collapse, reported
  * degrees.
  */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.peel(edges.toDF("a", "b"), "a", "b", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("triangle core survives; pendant chain cascades off round by round") {
    // triangle {1,2,3} + chain 3-4-5-6: at k=2 the chain peels one node
    // per round from the far end (6 first, then 5, then 4); the final
    // degree>=k report filter acts as one more half-round
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(run(e, k = 2, rounds = 1).keySet === Set(1L, 2L, 3L, 4L))
    assert(run(e, k = 2, rounds = 2).keySet === Set(1L, 2L, 3L))
    assert(run(e, k = 2, rounds = 3) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // converged: degrees in-core
  }

  test("K5 is its own 4-core; k=5 collapses it") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = run(k5, k = 4, rounds = 3)
    assert(got.keySet === (0L to 4L).toSet && got.values.forall(_ === 4L))
    assert(run(k5, k = 5, rounds = 2).isEmpty)
  }

  test("reported degrees are in the SURVIVING subgraph, not the input") {
    // K4 {1..4} plus two extra spokes on node 1; spokes peel at k=3 and
    // node 1's degree must come back as 3 (in-core), not 5 (input)
    val e = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) ++
      Seq((1L, 9L), (1L, 10L))
    val got = run(e, k = 3, rounds = 2)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
