package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The round-4 regression, pinned as a spec: operators that materialize
  * multi-consumer intermediates must RELEASE them once callers drop the
  * results — a long-lived session (notebook, Thrift server, bench loop)
  * must not accumulate pinned storage across calls. [[Materialize.once]]
  * blocks are ContextCleaner-reclaimed on driver GC; `Dataset.persist`
  * entries (the old behavior) sit in the CacheManager forever.
  */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private def storedRdds: Int = spark.sparkContext.getRDDStorageInfo.length

  /** GC + wait until the ContextCleaner drains, or time out. */
  private def eventuallyReleased(baseline: Int, timeoutMs: Long = 30000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      System.gc()
      if (storedRdds <= baseline) return true
      Thread.sleep(250)
    }
    false
  }

  test("materialized intermediates are reclaimed once results are dropped") {
    // earlier suites in the shared session may hold .cache() entries of
    // their own — clear them so the assertions below test THIS test's
    // operators, not suite ordering (caches are hints; clearing is safe)
    spark.catalog.clearCache()
    val baseline = storedRdds
    val docs = (0 until 60).map(i =>
      (i.toLong, s"token$i alpha beta gamma delta epsilon token${i % 7} zeta"))
      .toDF("doc_id", "text")
    // three repeated 'daily batches' through the persist-heavy operators —
    // the exact usage shape that accumulated blocks in round 4
    for (_ <- 1 to 3) {
      val pairs = Dedup.nearDuplicates(docs, "text", "doc_id",
        threshold = 0.2, numHashes = 32, bands = 16)
      pairs.count()
      val index = Dedup.bandIndex(docs.filter($"doc_id" % 2 === 0), "text", "doc_id")
      Dedup.probeIndex(docs.filter($"doc_id" % 2 === 1), index,
        docs.filter($"doc_id" % 2 === 0), "text", "doc_id",
        threshold = 0.2).count()
    }
    // while referenced, blocks may legitimately exist; after the refs die,
    // the cleaner must return the session to its baseline
    assert(eventuallyReleased(baseline),
      s"storage blocks not reclaimed: ${storedRdds} stored RDDs vs baseline $baseline")
    // and none of the operators may leave CacheManager entries (those are
    // never GC-reclaimed — the round-4 failure mode)
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator left a CacheManager entry (session-lifetime pin)")
  }

  test("Materialize.once computes the plan exactly once and yields a leaf") {
    val acc = spark.sparkContext.longAccumulator("evals")
    val upstream = spark.range(100).map { x => acc.add(1); x }
    val m = Materialize.once(upstream.toDF())
    assert(acc.value === 100) // eager: computed at materialization time
    m.count(); m.count()      // consumers read blocks, not the lineage
    assert(acc.value === 100)
    assert(m.queryExecution.optimizedPlan.getClass.getSimpleName === "LogicalRDD")
  }
}
