package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AssemblySpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 100L).map(i =>
    (i, if (i % 2 == 0) "en" else if (i % 3 == 0) "de" else "fr", 10 + i % 37))
    .toDF("doc_id", "lang", "len")

  test("mixByWeights: per-domain quotas honored, deterministic, unknown domains dropped") {
    val out = Assembly.mixByWeights(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25), budget = 40L)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("en") === 20L) // floor(0.5*40), 50 available
    assert(counts("de") === 10L) // floor(0.25*40), 17 available
    assert(!counts.contains("fr")) // not in weights
    val again = Assembly.mixByWeights(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25), budget = 40L)
    assert(out.orderBy("doc_id").collect().toSeq ===
      again.orderBy("doc_id").collect().toSeq)
  }

  test("stratifiedSampleByHash: keep decision is per-row stable under corpus growth") {
    val rows = (0L until 400L).map(i => (i, if (i % 4 == 0) "a" else "b")).toDF("id", "s")
    val fr = Map("a" -> 0.3, "b" -> 0.1)
    val full = Assembly.stratifiedSampleByHash(rows, "s", "id", fr)
      .select("id").as[Long].collect().toSet
    // drop half the corpus: surviving rows' decisions must not change
    val sub = Assembly.stratifiedSampleByHash(rows.filter($"id" < 200), "s", "id", fr)
      .select("id").as[Long].collect().toSet
    assert(sub === full.filter(_ < 200))
    // fractions approximately honored on the larger stratum
    val bKept = full.count(i => i % 4 != 0).toDouble / 300
    assert(math.abs(bKept - 0.1) < 0.07, s"b keep-rate $bKept")
  }

  test("mixByWeights: shortfall keeps all rows of a thin domain") {
    val counts = Assembly.mixByWeights(docs, "lang", "doc_id",
      Map("de" -> 1.0), budget = 1000L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("de") === 17L) // quota 1000, only 17 exist
  }

  test("lengthBuckets: batches respect size, buckets respect ranges, waste matches model") {
    val out = Assembly.lengthBuckets(docs, "len", "doc_id",
        bucketWidth = 10L, maxBucket = 3, batchSize = 8)
      .collect()
    assert(out.forall(_.getAs[Long]("n_docs") <= 8))
    assert(out.forall { r =>
      val waste = r.getAs[Long]("n_docs") * r.getAs[Long]("max_len") -
        (r.getAs[Long]("pad_waste") + 0L) // waste = n*max - sum => sum = n*max - waste
      waste >= r.getAs[Long]("n_docs") * r.getAs[Long]("min_len")
    })
    // every doc lands in exactly one batch
    assert(out.map(_.getAs[Long]("n_docs")).sum === 100L)
  }
}
