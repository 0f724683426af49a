package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SemDeDup: within-cell semantic pruning with the keep-lowest-id rule. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated directions plus exact-scaled clones; centroids are
  // the two unit axes so cell assignment is unambiguous
  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)), // base A (cell 0)
    (2L, Array(1.5f, 0.0f, 0.0f)), // clone of A -> dropped
    (3L, Array(0.8f, 0.6f, 0.0f)), // near A but cos = 0.8 < tau -> kept
    (4L, Array(0.0f, 1.0f, 0.0f)), // base B (cell 1)
    (5L, Array(0.0f, 2.0f, 0.0f)), // clone of B -> dropped
    (6L, Array(0.0f, 0.0f, 1.0f)) // lone C (assigned to some cell, no dup)
  ).toDF("vec_id", "embedding")

  private def cents = Seq(
    (0L, Array(1.0, 0.0, 0.0)),
    (1L, Array(0.0, 1.0, 0.0))
  ).toDF("cell", "centroid")

  test("clones drop, originals and non-dups survive; counts are exact") {
    val out = SemDedup.dedup(corpus, cents, tau = 0.99)
      .orderBy("vec_id")
      .collect() // 6-row verdict — dimension-sized by construction
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(out === Array(
      (1L, 0L, 1), (2L, 1L, 0), (3L, 0L, 1),
      (4L, 0L, 1), (5L, 1L, 0), (6L, 0L, 1)))
  }

  test("tau monotonicity: lowering tau can only drop more") {
    val keptHi = SemDedup.dedup(corpus, cents, tau = 0.99)
      .filter($"kept" === 1).select("vec_id").as[Long].collect().toSet
    val keptLo = SemDedup.dedup(corpus, cents, tau = 0.5)
      .filter($"kept" === 1).select("vec_id").as[Long].collect().toSet
    assert(keptLo.subsetOf(keptHi))
    // id 3 (cos 0.8 with A) survives tau=0.99 but drops at tau=0.5
    assert(keptHi.contains(3L) && !keptLo.contains(3L))
  }

  test("cross-cell duplicates survive (documented recall trade-off)") {
    // two tau-similar vectors pulled into DIFFERENT cells by adversarial
    // centroids never pair up — SemDeDup's recall rides on the clustering
    val twin = Seq(
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(1.0f, -0.1f))).toDF("vec_id", "embedding")
    val splitCents = Seq(
      (0L, Array(1.0, 1.0)),
      (1L, Array(1.0, -1.0))).toDF("cell", "centroid")
    val out = SemDedup.dedup(twin, splitCents, tau = 0.9)
    // cos(v1, v2) = 0.99/1.01 ~ 0.980 >= tau, yet both are kept
    assert(out.filter($"kept" === 1).count() === 2)
    assert(out.select("cell").distinct().count() === 2)
  }

  test("routed assignment: exact on separated geometry; clones still drop") {
    val out = SemDedup.dedupRouted(corpus, cents, tau = 0.99, probes = 1)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(out === Array(
      (1L, 0L, 1), (2L, 1L, 0), (3L, 0L, 1),
      (4L, 0L, 1), (5L, 1L, 0), (6L, 0L, 1)))
  }

  test("full-probe routing degenerates to flat assignment exactly") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 100L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cs = (0L until 16L).map(c =>
      (c, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("cell", "centroid")
    val flat = Similarity.assignCells(vecs, cs)
      .select("vec_id", "cell").orderBy("vec_id").collect().toSeq
    // nsuper = 4, probes = 4 probes EVERY super -> candidate set is the
    // whole centroid table -> argmax must match flat assignment bit for bit
    val routedAll = Similarity.assignCellsRouted(vecs, cs, nsuper = 4, probes = 4)
      .select("vec_id", "cell").orderBy("vec_id").collect().toSeq
    assert(routedAll === flat)
    // probes = 1 is approximate but must still produce one cell per vector
    val routed1 = Similarity.assignCellsRouted(vecs, cs, nsuper = 4, probes = 1)
    assert(routed1.count() === 100)
    assert(routed1.select("cell").distinct().count() <= 16)
  }

  test("verdict is partitioning-invariant") {
    val a = SemDedup.dedup(corpus.repartition(7), cents, tau = 0.99)
      .orderBy("vec_id").collect().toSeq
    val b = SemDedup.dedup(corpus.coalesce(1), cents, tau = 0.99)
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
  }
}
