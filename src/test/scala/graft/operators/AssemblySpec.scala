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

  test("groupHoldout: split is a function of the group; every group lands in one split") {
    val rows = (0L until 300L).map(i => (i, s"host${i % 30}")).toDF("id", "host")
    val out = Assembly.groupHoldout(rows, "host")
    // leakage-free: each host maps to exactly one split
    assert(out.groupBy("host").agg(countDistinct("split").as("k"))
      .filter($"k" =!= 1).count() === 0)
    // growth-consistency: dropping rows never moves a surviving host
    val sub = Assembly.groupHoldout(rows.filter($"id" < 100), "host")
      .select("host", "split").distinct().as[(String, String)].collect().toMap
    val full = out.select("host", "split").distinct()
      .as[(String, String)].collect().toMap
    sub.foreach { case (h, s) => assert(full(h) === s, h) }
    // budgets: per-mille thresholds partition the bucket space
    val zeroValid = Assembly.groupHoldout(rows, "host", 1000, 0)
    assert(zeroValid.filter($"split" =!= "train").count() === 0)
  }

  test("weightedSample: heavier rows win proportionally; sample is reproducible") {
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) 100L else 1L)).toDF("id", "w")
    val out = Assembly.weightedSample(rows, "id", col("w"), k = 200)
    assert(out.count() === 200)
    // ~99% of picks should be heavy rows (w=100 vs w=1 at 1000/1000 split)
    val heavy = out.filter($"id" % 2 === 0).count()
    assert(heavy >= 180, s"heavy picks: $heavy")
    // without replacement + deterministic
    assert(out.select("id").distinct().count() === 200)
    val again = Assembly.weightedSample(rows, "id", col("w"), k = 200)
    assert(out.orderBy("id").collect().toSeq === again.orderBy("id").collect().toSeq)
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
