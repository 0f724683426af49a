package graft.multimodal

import graft.SparkTestBase
import graft.operators.HammingJoin
import org.apache.spark.sql.functions._

/** dHash / audio-fingerprint semantics plus the banded Hamming join's
  * completeness guarantee.
  */
class PerceptualHashSpec extends SparkTestBase {
  import spark.implicits._

  private def bmpMedia(ids: Seq[(Long, Long)]) = // (media_id, pattern seed)
    ids.toDF("media_id", "seed").select(col("media_id"),
      Multimodal.syntheticBmpScramble(col("seed"), lit(12), lit(10))
        .as("payload"))

  test("dhash: identical images hash identically; brightness shift is invariant") {
    val media = bmpMedia(Seq((1L, 5L), (2L, 5L), (3L, 40L)))
    val h = ImageHash.dhash(media).as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L), "same pattern, same hash")
    assert(h.values.forall(v => v >= 0L && v < (1L << 56)))
    // a constant brightness shift (+8 on every channel) flips no comparison
    // — emulate by shifting the pattern id by 256/31-coprime steps that
    // change all pixels by the same constant: id += 8·(256/ gcd…) is messy;
    // instead verify directly on a decoded image
    val img = PixelDecode.decode(
      media.filter(col("media_id") === 1L).select("payload")
        .as[Array[Byte]].head()).get
    val shifted = img.copy(samples = img.samples.map(v => (v + 8) % 256))
    // wraparound can flip comparisons where v+8 crosses 256; restrict the
    // invariance claim to the non-wrapping case
    if (img.samples.forall(_ < 248))
      assert(ImageHash.dhashOf(img) === ImageHash.dhashOf(shifted))
    else ImageHash.dhashOf(shifted) // still must not throw
  }

  test("audio fingerprint: same seed ⇒ same fp; two-frame minimum enforced") {
    val media = Seq((1L, 7L), (2L, 7L), (3L, 21L)).toDF("media_id", "seed")
      .select(col("media_id"),
        Multimodal.syntheticWavScramble(col("seed"), lit(1024)).as("payload"))
    val fp = AudioHash.fingerprint(media)
      .select("media_id", "fp").as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    val tiny = Seq((9L, 3L)).toDF("media_id", "seed").select(col("media_id"),
      Multimodal.syntheticWavScramble(col("seed"), lit(20)).as("payload"))
    assert(AudioHash.fingerprint(tiny).count() === 0, "< 2 frames drops")
  }

  test("HammingJoin: banded candidates equal brute force (completeness)") {
    // 63-bit hashes crafted around the band boundaries (16/16/16/15)
    val hashes = Seq(
      0L, 1L, 3L,                      // dist(0,1)=1, dist(0,3)=2, dist(1,3)=1
      1L << 16 | 1L << 32,             // touches bands 1 and 2
      1L << 16 | 1L << 32 | 1L << 62,  // +1 bit in the top band
      0x7FFFFFFFFFFFFFFFL,             // far from everything
      0x7FFFFFFFFFFFFFFFL ^ (1L << 15) ^ (1L << 31)) // dist 2 from prev
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = hashes.toDF("id", "h")
    val got = HammingJoin.selfPairs(df, "id", "h", bits = 63, bands = 4,
        maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val brute = (for {
      ((idA, hA), i) <- hashes.zipWithIndex
      ((idB, hB), j) <- hashes.zipWithIndex if i < j
      d = java.lang.Long.bitCount(hA ^ hB) if d <= 2
    } yield (idA, idB) -> d).toMap
    assert(got === brute, s"got=$got brute=$brute")
    assert(brute.nonEmpty && brute.values.exists(_ === 2))
  }

  test("HammingJoin rejects maxDist >= bands (pigeonhole would be unsound)") {
    val df = Seq((1L, 2L)).toDF("id", "h")
    intercept[IllegalArgumentException] {
      HammingJoin.selfPairs(df, "id", "h", bits = 63, bands = 4, maxDist = 4)
    }
  }

  test("image near-dup plan shape: equi-join on (band, bv), no product") {
    val media = bmpMedia((1L to 40L).map(i => (i, i % 7)))
    val plan = ImageHash.nearDuplicates(media, maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("probeNearDuplicates == nearDuplicates restricted to batch-touching pairs") {
    val corpus = bmpMedia((1L to 60L).map(i => (i, i % 9)))
    val batchIds = (1L to 60L).filter(_ % 3 == 0).toSet
    val index = ImageHash.dhash(corpus.filter(!col("media_id").isin(batchIds.toSeq: _*)))
    val got = ImageHash.probeNearDuplicates(
        corpus.filter(col("media_id").isin(batchIds.toSeq: _*)), index)
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    val want = ImageHash.nearDuplicates(corpus)
      .as[(Long, Long, Long, Long, Int)].collect()
      .filter(r => batchIds(r._1) || batchIds(r._2)).toSet
    assert(got === want, s"probe must equal the restricted full relation")
    assert(got.nonEmpty, "fixture must plant batch-touching clones")
    // index-internal pairs never surface
    assert(got.forall(r => batchIds(r._1) || batchIds(r._2)))
  }

  test("retried micro-batch probes the PRE-BATCH index: dedup + self-anti-join (q193 discipline)") {
    // simulate a foreachBatch retry whose FIRST attempt already appended
    // the batch's hashes to the index: the raw index now holds the batch's
    // own ids. Probing it directly duplicates same-batch pairs through the
    // index side; the q193 read discipline (dropDuplicates on media_id +
    // left_anti against the batch's ids) must reconstruct the clean run.
    val corpus = bmpMedia((1L to 60L).map(i => (i, i % 9)))
    val batchIds = (1L to 60L).filter(_ % 3 == 0).toSet
    val batch = corpus.filter(col("media_id").isin(batchIds.toSeq: _*))
    val cleanIndex = ImageHash.dhash(
      corpus.filter(!col("media_id").isin(batchIds.toSeq: _*)))
    val clean = ImageHash.probeNearDuplicates(batch, cleanIndex)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(clean.length === clean.toSet.size, "clean run must be duplicate-free")

    // index after the failed attempt: corpus hashes + the batch's own,
    // plus a double-append of one prior batch (at-least-once both ways)
    val dirtyIndex = cleanIndex
      .unionByName(ImageHash.dhash(batch))
      .unionByName(cleanIndex.limit(5))
    val preBatch = dirtyIndex.dropDuplicates("media_id")
      .join(batch.select(col("media_id")), Seq("media_id"), "left_anti")
    val retried = ImageHash.probeNearDuplicates(batch, preBatch)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(retried.sorted.toSeq === clean.sorted.toSeq,
      "retried batch must emit exactly the clean run's verdicts")
  }
}
