package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

/** Round-4 pipeline operators: exact-substring duplication, hashed linear
  * classifier, product quantization, ordered funnel.
  */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------- ExactSubstring ----------------

  private val docs = Seq(
    (1L, "a b c d e f"),   // shares "a b c", "b c d" with doc 2
    (2L, "x a b c d y"),
    (3L, "p q r"),         // exactly k tokens, unique
    (4L, "z z"),           // shorter than k: whole-text gram
    (5L, "z z"),           // exact short duplicate of 4
    (6L, "m m m m m")      // self-repeating only — NOT cross-doc duplicated
  ).toDF("doc_id", "text")

  private def reportK3(key: Column => Column = xxhash64(_)) =
    ExactSubstring.report(docs, "text", "doc_id", k = 3, minDocs = 2, gramKey = key)
      .orderBy("id").collect()

  test("ExactSubstring: span counts, distinct grams, interval-union coverage") {
    val rows = reportK3().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc1: 4 spans, dup at pos 0 ("a b c") and 1 ("b c d") → union [0,4) = 4 of 6
    assert(rows(1L) === ((4L, 2L, 2L, 4L, 6L)))
    // doc2: dup at pos 1, 2 → union [1,5) = 4 of 6
    assert(rows(2L) === ((4L, 2L, 2L, 4L, 6L)))
    // doc3: single span, no duplication
    assert(rows(3L) === ((1L, 0L, 0L, 0L, 3L)))
    // docs 4/5: whole-text gram duplicated; coverage clamped to n_toks=2 (< k)
    assert(rows(4L) === ((1L, 1L, 1L, 2L, 2L)))
    assert(rows(5L) === ((1L, 1L, 1L, 2L, 2L)))
    // doc6: "m m m" occurs 3× but only in ONE distinct doc → not duplicated
    assert(rows(6L) === ((3L, 0L, 0L, 0L, 5L)))
  }

  test("ExactSubstring: xxhash64 key ≡ raw-string key on the fixtures") {
    val a = reportK3().map(_.toSeq)
    val b = reportK3(c => c).map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("ExactSubstring: dup_ratio is covered/n_tokens") {
    val r = reportK3(c => c).find(_.getLong(0) == 1L).get
    assert(math.abs(r.getDouble(6) - 4.0 / 6.0) < 1e-9)
  }

  // ---------------- HashedClassifier ----------------

  private def expectedWeight(tok: String, nBuckets: Int, seed: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val b = java.lang.Long.parseLong(hex.take(8), 16) % nBuckets
    (b * 2654435761L + seed * 97L + 13L) % 2000000L - 1000000L
  }

  test("HashedClassifier: score is the exact integer sum of per-token weights") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text")
    val out = graft.text.HashedClassifier.score(df, "text", "doc_id", 1024, 7L)
      .orderBy("id").collect()
    val w = (t: String) => expectedWeight(t, 1024, 7L)
    assert(out(0).getAs[Long]("score_micro") === 2 * w("alpha") + w("beta"))
    assert(out(0).getAs[Long]("n_tokens") === 3L)
    assert(out(1).getAs[Long]("score_micro") === w("gamma"))
    val avg0 = out(0).getAs[Double]("avg_score")
    assert(math.abs(avg0 - (2 * w("alpha") + w("beta")) / 1e6 / 3) < 1e-12)
    assert(out(0).getAs[Int]("label") === (if (avg0 > 0) 1 else 0))
  }

  // ---------------- ProductQuantization ----------------

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("PQ: argmin encoding with lowest-code tiebreak") {
    import ProductQuantization._
    val cb = codebooksFromSeeds(vecs, m = 2, subDim = 2)
    assert(cb.count() === 8) // 2 subspaces × 4 codes
    val enc = encode(vecs, cb, m = 2, subDim = 2).orderBy("id", "sub")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // e0 sub1=(0,0) is shared by seed codes 0 and 1 → tie breaks to 0;
    // e2/e3 sub0=(0,0) is shared by codes 2 and 3 → tie breaks to 2.
    assert(enc.toSeq === Seq(
      (0L, 0L, 0L), (0L, 1L, 0L),
      (1L, 0L, 1L), (1L, 1L, 0L),
      (2L, 0L, 2L), (2L, 1L, 2L),
      (3L, 0L, 2L), (3L, 1L, 3L)))
  }

  test("PQ: with a perfect codebook ADC reproduces exact L2 ranking") {
    import ProductQuantization._
    // corpus == seeds → quantization is lossless, ADC == exact distance
    val cb = codebooksFromSeeds(vecs, m = 2, subDim = 2)
    val enc = encode(vecs, cb, m = 2, subDim = 2)
    val q = vecs.filter(col("vec_id") === 0L)
    val out = adcTopK(enc, q, cb, k = 3, m = 2, subDim = 2)
      .orderBy("rank").collect()
    assert(out.length === 3)
    // all three others are at L2² = 2.0 from e0 → tie, neighbor_id ascending
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    out.foreach(r => assert(math.abs(r.getAs[Double]("adc_r") - 2.0) < 1e-9))
  }

  test("PQ: encode is invariant to input partitioning") {
    import ProductQuantization._
    val cb = codebooksFromSeeds(vecs, m = 2, subDim = 2)
    val a = encode(vecs, cb, 2, 2).orderBy("id", "sub").collect().map(_.toSeq)
    val b = encode(vecs.repartition(7), cb, 2, 2)
      .orderBy("id", "sub").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  // ---------------- Funnel ----------------

  private val H = 3600L * 1000000000L // 1h in ns
  private val funnelEvents = Seq(
    // u1: full in-order conversion view(0) → click(1h) → purchase(2h)
    (1L, "view", 0L), (1L, "click", 1 * H), (1L, "purchase", 2 * H),
    // u2: purchase WITHOUT a click → stops after view
    (2L, "view", 0L), (2L, "purchase", 1 * H),
    // u3: click only — never enters the funnel
    (3L, "click", 0L),
    // u4: click outside the 7-day window
    (4L, "view", 0L), (4L, "click", 8L * 24 * 3600 * 1000000000L),
    // u5: click BEFORE the first view — not in-order
    (5L, "click", 1 * H), (5L, "view", 2 * H),
    // u6: duplicate clicks — first eligible click wins for timing
    (6L, "view", 0L), (6L, "click", 4 * H), (6L, "click", 2 * H)
  ).toDF("user_id", "event_type", "ts_ns")

  test("Funnel: in-order stage counts within the window") {
    val out = Funnel.report(funnelEvents, "user_id", "event_type", "ts_ns",
      Seq("view", "click", "purchase"), 7L * 86400L * 1000000000L)
      .orderBy("stage_idx").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("view", 5L), ("click", 2L), ("purchase", 1L)))
    // mean hours to click: u1 at 1h, u6 at 2h → 1.5
    assert(math.abs(out(1).getAs[Double]("mean_hours_r") - 1.5) < 1e-9)
    assert(math.abs(out(2).getAs[Double]("mean_hours_r") - 2.0) < 1e-9)
    assert(out(0).getAs[Double]("mean_hours_r") === 0.0)
  }

  test("Funnel.completions: per-user frame of last-stage reachers, consistent with report") {
    val win = 7L * 86400L * 1000000000L
    val done = Funnel.completions(funnelEvents, "user_id", "event_type",
      "ts_ns", Seq("view", "click", "purchase"), win).collect()
    // only u1 completes view→click→purchase in order inside the window
    assert(done.map(_.getLong(0)).toSeq === Seq(1L))
    assert(done.head.getLong(1) === 0L)      // t0 = first view
    assert(done.head.getLong(2) === 2 * H)   // t_prev = purchase time
    // frame cardinality must equal report's last-stage n_users
    val n = Funnel.report(funnelEvents, "user_id", "event_type", "ts_ns",
      Seq("view", "click", "purchase"), win)
      .filter(col("stage") === "purchase").select("n_users")
      .as[Long].head()
    assert(n === done.length.toLong)
  }

  // ---------------- Retention ----------------

  test("Retention: epoch-aligned cohorts, offsets, distinct active users") {
    val ev = Seq(
      (1L, 0L), (1L, 25L),           // u1: cohort bucket 0, active at offset 2
      (2L, 5L), (2L, 11L), (2L, 13L), // u2: cohort 0, active at offset 1 (twice)
      (3L, 21L)                       // u3: cohort 2 only
    ).toDF("user_id", "ts_ns")
    val out = Retention.report(ev, "user_id", "ts_ns", bucketNs = 10L)
      .orderBy("cohort_bucket", "bucket_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (0L, 2L, 1L, 2L, 0.5),
      (2L, 0L, 1L, 1L, 1.0)))
  }

  // ---------------- RandomProjection ----------------

  test("RandomProjection: values are the sequential-fold dots") {
    val emb = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(-1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val planes = Array(Array(0.5, 0.25), Array(-1.0, 1.0))
    val out = RandomProjection.projectLong(emb, planes)
      .orderBy("vec_id", "rdim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, 0L, 1.0), (1L, 1L, 1.0),
      (2L, 0L, -0.375), (2L, 1L, 1.5)))
  }

  test("RandomProjection: wide form carries a length-r projected array") {
    val emb = Seq((1L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val planes = Similarity.portablePlanes(bits = 16, dims = 64, table = 9)
    val row = RandomProjection.project(emb, planes).select("projected").head()
    assert(row.getSeq[Double](0).length === 16)
  }

  test("Funnel: empty stage yields zero count and 0.0 mean (no NaN)") {
    val out = Funnel.report(funnelEvents, "user_id", "event_type", "ts_ns",
      Seq("view", "click", "signup"), 7L * 86400L * 1000000000L)
      .orderBy("stage_idx").collect()
    assert(out(2).getLong(2) === 0L)
    assert(out(2).getAs[Double]("mean_hours_r") === 0.0)
  }
}
