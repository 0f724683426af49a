package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-pipeline + product-analytics queries: exact-substring
  * duplication (q94), hashed-linear-classifier quality scoring (q95),
  * product-quantization ANN (q96), funnel/retention (q97/q98), pixel
  * stats (q100), the curation dashboard (q101), per-source caps (q102),
  * and event-path analytics (q103/q104). Every gate replays end to end
  * in DuckDB — hashing, codebooks, and integer-unit score/distance math
  * are all engine-portable.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exact-substring duplication report
    * ([[graft.operators.ExactSubstring]]): 8-token positional grams, a
    * span is duplicated when ≥2 documents share it; per-doc span counts +
    * exact interval-union coverage. Gated with the raw gram string as the
    * key (engine-portable); the xxhash64 8-byte key is the scale default,
    * spec-verified equal on the fixtures.
    */
  def q94DupSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.ExactSubstring.report(
      Tables.documents(s, dir), "text", "doc_id", k = 8, minDocs = 2,
      gramKey = (c: Column) => c)

  val q94Sql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, len(t) AS n_toks, g.pos AS pos, g.gram AS gram FROM (
      |    SELECT doc_id, t, unnest(CASE WHEN len(t) >= 8
      |      THEN list_transform(generate_series(1, len(t)-7),
      |           i -> {'pos': CAST(i-1 AS BIGINT), 'gram': array_to_string(t[i:i+7], ' ')})
      |      ELSE [{'pos': CAST(0 AS BIGINT), 'gram': array_to_string(t, ' ')}] END) AS g
      |    FROM toks)),
      |dup AS (SELECT gram FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      |flags AS (SELECT g.doc_id, g.n_toks, g.pos, g.gram, (d.gram IS NOT NULL) AS is_dup
      |          FROM grams g LEFT JOIN dup d USING (gram)),
      |perdoc AS (SELECT doc_id AS id,
      |    CAST(count(*) AS BIGINT) AS n_spans,
      |    CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
      |    CAST(count(DISTINCT CASE WHEN is_dup THEN gram END) AS BIGINT) AS n_dup_grams,
      |    CAST(max(n_toks) AS BIGINT) AS n_tokens
      |  FROM flags GROUP BY 1),
      |cov AS (SELECT doc_id AS id, CAST(count(DISTINCT tok) AS BIGINT) AS covered_tokens
      |  FROM (SELECT doc_id, unnest(generate_series(pos, least(pos+7, n_toks-1))) AS tok
      |        FROM flags WHERE is_dup) u GROUP BY 1)
      |SELECT p.id, n_spans, n_dup_spans, n_dup_grams,
      |  coalesce(c.covered_tokens, 0) AS covered_tokens, n_tokens,
      |  round(coalesce(c.covered_tokens, 0) / CAST(n_tokens AS DOUBLE), 9) AS dup_ratio_r
      |FROM perdoc p LEFT JOIN cov c USING (id)""".stripMargin

  /** Model-based quality scoring ([[graft.text.HashedClassifier]]):
    * fastText-shaped linear scorer over md5-hashed token buckets with
    * integer-micro weights — the exact-integer stand-in for a broadcast
    * trained-weight array (identical plan either way).
    */
  def q95HashedClassifier(s: SparkSession, dir: String): DataFrame =
    graft.text.HashedClassifier.score(
      Tables.documents(s, dir), "text", "doc_id", nBuckets = 1024, seed = 7L)

  val q95Sql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents),
      |w AS (SELECT doc_id,
      |    (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024) AS b
      |  FROM tok),
      |sc AS (SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum((b * 2654435761 + 692) % 2000000 - 1000000) AS BIGINT) AS score_micro
      |  FROM w GROUP BY 1)
      |SELECT id, n_tokens, score_micro,
      |  score_micro / 1e6 / n_tokens AS avg_score,
      |  CAST(score_micro / 1e6 / n_tokens > 0 AS INT) AS label
      |FROM sc""".stripMargin

  /** Product-quantization ANN ([[graft.operators.ProductQuantization]]):
    * m=8 subspaces × 8 dims, 16 codes per subspace seeded from the
    * deterministic vec_id%25=3 sample (the q54 technique); every 100th
    * vector queries the encoded corpus via ADC. Codebook build, encode
    * argmin, and integer-nano ADC sums all replay in SQL — the
    * approximation itself is under the hash.
    */
  def q96PqAdc(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ProductQuantization._
    val emb = Tables.embeddings(s, dir)
    val seeds = emb.filter(col("vec_id") % 25 === 3).orderBy(col("vec_id")).limit(16)
    val cb = codebooksFromSeeds(seeds, m = 8, subDim = 8)
    val enc = encode(emb, cb, m = 8, subDim = 8)
    adcTopK(enc, emb.filter(col("vec_id") % 100 === 0), cb,
      k = 10, m = 8, subDim = 8)
  }

  val q96Sql: String = {
    val fold = (a: String, b: String) =>
      s"""CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(generate_series(1, 8), j -> ($a[j]-$b[j])*($a[j]-$b[j]))),
         |      (acc, x) -> acc + x) * 1e9) AS BIGINT)""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
       |seeds AS (SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT) AS code
       |          FROM (SELECT vec_id, v FROM e WHERE vec_id % 25 = 3 ORDER BY vec_id ASC LIMIT 16) s0),
       |cb AS (SELECT CAST(s.sub AS BIGINT) AS sub, seeds.code,
       |         seeds.v[s.sub*8+1 : s.sub*8+8] AS cvec
       |       FROM seeds, subs s),
       |sv AS (SELECT e.vec_id AS id, CAST(s.sub AS BIGINT) AS sub,
       |         e.v[s.sub*8+1 : s.sub*8+8] AS svec
       |       FROM e, subs s),
       |enc AS (SELECT id, sub, code FROM (
       |    SELECT sv.id, sv.sub, cb.code,
       |      row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
       |        ${fold("sv.svec", "cb.cvec")} ASC, cb.code ASC) AS rn
       |    FROM sv JOIN cb USING (sub)) r
       |  WHERE rn = 1),
       |lut AS (SELECT q.query_id, cb.sub, cb.code, ${fold("q.qsub", "cb.cvec")} AS d_nano
       |  FROM (SELECT e.vec_id AS query_id, CAST(s.sub AS BIGINT) AS sub,
       |          e.v[s.sub*8+1 : s.sub*8+8] AS qsub
       |        FROM e, subs s WHERE e.vec_id % 100 = 0) q
       |  JOIN cb ON q.sub = cb.sub),
       |scored AS (SELECT l.query_id, enc.id AS neighbor_id,
       |    CAST(sum(d_nano) AS BIGINT) AS adc_nano
       |  FROM enc JOIN lut l ON enc.sub = l.sub AND enc.code = l.code
       |  WHERE enc.id <> l.query_id GROUP BY 1, 2),
       |ranked AS (SELECT query_id, neighbor_id, adc_nano,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc_nano ASC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc_nano / 1e9 AS adc_r, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 10""".stripMargin
  }

  /** Ordered-funnel analytics ([[graft.operators.Funnel]]): view → click →
    * purchase within 7 days of the user's first view, counting only
    * in-order events; per-stage user counts + mean hours-to-stage. Time
    * math is exact epoch-nanos (the events table's native precision).
    */
  def q97Funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.report(Tables.events(s, dir),
      "user_id", "event_type", "ts_ns",
      stages = Seq("view", "click", "purchase"),
      windowNs = 7L * 86400L * 1000000000L)

  val q97Sql: String =
    """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_ns(ts) AS t FROM events),
      |s0 AS (SELECT u, min(t) AS t0 FROM e WHERE et = 'view' GROUP BY 1),
      |s1 AS (SELECT e.u, min(s0.t0) AS t0, min(e.t) AS t1
      |       FROM e JOIN s0 ON e.u = s0.u
      |       WHERE e.et = 'click' AND e.t > s0.t0 AND e.t <= s0.t0 + 604800000000000
      |       GROUP BY 1),
      |s2 AS (SELECT e.u, min(s1.t0) AS t0, min(e.t) AS t2
      |       FROM e JOIN s1 ON e.u = s1.u
      |       WHERE e.et = 'purchase' AND e.t > s1.t1 AND e.t <= s1.t0 + 604800000000000
      |       GROUP BY 1)
      |SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CASE WHEN count(*) = 0 THEN 0.0
      |       ELSE round(CAST(sum(t0 - t0) AS DOUBLE) / count(*) / 3.6e12, 6) END AS mean_hours_r
      |FROM s0
      |UNION ALL
      |SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT),
      |  CASE WHEN count(*) = 0 THEN 0.0
      |       ELSE round(CAST(sum(t1 - t0) AS DOUBLE) / count(*) / 3.6e12, 6) END
      |FROM s1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT),
      |  CASE WHEN count(*) = 0 THEN 0.0
      |       ELSE round(CAST(sum(t2 - t0) AS DOUBLE) / count(*) / 3.6e12, 6) END
      |FROM s2""".stripMargin

  /** Cohort retention ([[graft.operators.Retention]]): 7-day epoch-aligned
    * cohorts by first PURCHASE (the sparse engagement event — all-event
    * cohorts are trivially 100% retained on this fixture); per (cohort,
    * offset) distinct active users. Pure integer bucket math — no calendar
    * functions to desync engines.
    */
  def q98Retention(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retention.report(
      Tables.events(s, dir).filter(col("event_type") === "purchase"),
      "user_id", "ts_ns", bucketNs = 7L * 86400L * 1000000000L)

  val q98Sql: String =
    """WITH e AS (SELECT user_id AS u, epoch_ns(ts) // 604800000000000 AS bk
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT u, min(bk) AS cb FROM e GROUP BY 1),
      |s AS (SELECT cb, CAST(count(*) AS BIGINT) AS n_cohort FROM c GROUP BY 1),
      |a AS (SELECT c.cb, e.bk - c.cb AS bucket_offset,
      |        CAST(count(DISTINCT e.u) AS BIGINT) AS n_active
      |      FROM e JOIN c ON e.u = c.u GROUP BY 1, 2)
      |SELECT a.cb AS cohort_bucket, a.bucket_offset, a.n_active, s.n_cohort,
      |  round(a.n_active / CAST(s.n_cohort AS DOUBLE), 9) AS retention_r
      |FROM a JOIN s ON a.cb = s.cb""".stripMargin

  /** Johnson–Lindenstrauss random projection
    * ([[graft.operators.RandomProjection]]): 64 → 16 dims through the
    * portable integer-formula planes (table seed 9); long-form values at
    * 9dp. The oracle regenerates the planes and replays every dot product.
    */
  def q99RandomProjection(s: SparkSession, dir: String): DataFrame =
    graft.operators.RandomProjection.projectLong(
      Tables.embeddings(s, dir),
      graft.operators.Similarity.portablePlanes(bits = 16, dims = 64, table = 9))

  val q99Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |planes AS (SELECT b, d,
      |    (((9*100003 + b*64 + d + 1) * 2654435761) % 4294967296) / 2147483648.0 - 1.0 AS c
      |  FROM (SELECT unnest(generate_series(0, 15)) AS b) bb,
      |       (SELECT unnest(generate_series(0, 63)) AS d) dd),
      |pl AS (SELECT b, list(c ORDER BY d) AS pv FROM planes GROUP BY 1)
      |SELECT e.vec_id, CAST(p.b AS BIGINT) AS rdim,
      |  round(list_dot_product(e.v, p.pv), 9) AS value_r
      |FROM e CROSS JOIN pl p""".stripMargin

  /** Real PIXEL decode end to end ([[graft.multimodal.PixelDecode]]): each
    * document becomes a real padded 24-bit BMP whose pixel values follow an
    * integer formula ([[graft.multimodal.Multimodal.syntheticBmpPattern]] —
    * bottom-up rows, BGR bytes, 4-byte stride, assembled in Column byte
    * math); [[graft.multimodal.Multimodal.pixelStats]] walks the bytes back
    * into per-channel stats. The oracle replays the FORMULA over the
    * (row, col, channel) grid without touching bytes, so any defect in the
    * encoder or the decoder (offset, stride, BGR order, bottom-up flip —
    * the flip is pinned by the position-sensitive `top_left_r` /
    * `bottom_right_b` probes) hash-mismatches. PNG pixel decode (inflate +
    * de-filter) is spec-gated in PixelDecodeSpec — a valid zlib stream
    * cannot be authored in SQL.
    */
  def q100PixelStats(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(1) + col("doc_id") % 5).cast("int")
    val h = (lit(1) + col("doc_id") % 4).cast("int")
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticBmpPattern(col("doc_id"), w, h)
        .as("payload"))
    graft.multimodal.Multimodal.pixelStats(media)
  }

  val q100Sql: String =
    """WITH g AS (SELECT doc_id, CAST(1 + doc_id % 5 AS INT) AS w,
      |                  CAST(1 + doc_id % 4 AS INT) AS h FROM documents),
      |px1 AS (SELECT doc_id, w, h, unnest(generate_series(0, CAST(h-1 AS BIGINT))) AS r FROM g),
      |px2 AS (SELECT doc_id, w, h, r, unnest(generate_series(0, CAST(w-1 AS BIGINT))) AS c FROM px1),
      |px AS (SELECT doc_id, w, h, r, c, unnest([0, 1, 2]) AS ch FROM px2),
      |pxv AS (SELECT doc_id, w, h, r, c, ch,
      |         CAST((doc_id*31 + r*7 + c*3 + ch*11) % 256 AS INT) AS v FROM px)
      |SELECT doc_id AS media_id, 'bmp' AS format, w AS width, h AS height,
      |  CAST(3 AS INT) AS channels,
      |  CAST(sum(CASE WHEN ch = 0 THEN v END) AS DOUBLE) / (w*h) AS r_mean,
      |  CAST(min(CASE WHEN ch = 0 THEN v END) AS INT) AS r_min,
      |  CAST(max(CASE WHEN ch = 0 THEN v END) AS INT) AS r_max,
      |  CAST(sum(CASE WHEN ch = 1 THEN v END) AS DOUBLE) / (w*h) AS g_mean,
      |  CAST(min(CASE WHEN ch = 1 THEN v END) AS INT) AS g_min,
      |  CAST(max(CASE WHEN ch = 1 THEN v END) AS INT) AS g_max,
      |  CAST(sum(CASE WHEN ch = 2 THEN v END) AS DOUBLE) / (w*h) AS b_mean,
      |  CAST(min(CASE WHEN ch = 2 THEN v END) AS INT) AS b_min,
      |  CAST(max(CASE WHEN ch = 2 THEN v END) AS INT) AS b_max,
      |  CAST(max(CASE WHEN r = 0 AND c = 0 AND ch = 0 THEN v END) AS INT)
      |    AS top_left_r,
      |  CAST(max(CASE WHEN r = h-1 AND c = w-1 AND ch = 2 THEN v END) AS INT)
      |    AS bottom_right_b
      |FROM pxv GROUP BY doc_id, w, h""".stripMargin

  /** Audio features over REAL 16-bit PCM WAV payloads: each document
    * carries a [[graft.multimodal.Multimodal.syntheticWavPattern]] clip
    * (RIFF container assembled in Column byte math, samples from a
    * deterministic formula), decoded from first principles by
    * [[graft.multimodal.WavDecode]] and framed into 64-sample windows —
    * per-frame RMS energy, peak, zero-crossing count. The oracle replays
    * the FORMULA (never touching bytes): integer-exact Σs² keeps the
    * IEEE sqrt bit-identical across engines; varying clip lengths leave
    * a partial trailing frame to catch off-by-one framing.
    */
  def q123AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    val n = (lit(96) + (col("doc_id") % 3) * 64).cast("int")
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticWavPattern(col("doc_id"), n)
        .as("payload"))
    graft.multimodal.Multimodal.audioFeatures(media, frameSize = 64)
  }

  val q123Sql: String =
    """WITH g AS (SELECT doc_id, 96 + (doc_id % 3) * 64 AS n FROM documents),
      |s1 AS (SELECT doc_id, n, unnest(generate_series(0, CAST(n-1 AS BIGINT))) AS i FROM g),
      |sv AS (SELECT doc_id, i, CAST((doc_id*37 + i*13) % 2048 - 1024 AS INT) AS s FROM s1),
      |fr AS (SELECT doc_id, CAST(i // 64 AS INT) AS frame_idx, i, s,
      |    lag(s) OVER (PARTITION BY doc_id, i // 64 ORDER BY i) AS prev FROM sv)
      |SELECT doc_id AS media_id, frame_idx, CAST(count(*) AS INT) AS n_samples,
      |  sqrt(sum(CAST(s AS DOUBLE) * s) / count(*)) AS rms,
      |  CAST(max(abs(s)) AS INT) AS peak,
      |  CAST(sum(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (s < 0))
      |    THEN 1 ELSE 0 END) AS INT) AS zero_crossings
      |FROM fr GROUP BY 1, 2""".stripMargin

  /** Nearest-neighbor image resize over real decoded pixels: the
    * [[graft.multimodal.Multimodal.syntheticBmpPattern]] corpus (4×3 up
    * to 8×6 frames) resized to a fixed 3×2 thumbnail, every output pixel
    * emitted. The oracle replays the formula at the floor-mapped source
    * coordinates (r·h/oh, c·w/ow), so a defect in the decode walk OR the
    * index mapping breaks the comparison.
    */
  def q124ImageResize(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(4) + col("doc_id") % 5).cast("int")
    val h = (lit(3) + col("doc_id") % 4).cast("int")
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticBmpPattern(col("doc_id"), w, h)
        .as("payload"))
    graft.multimodal.Multimodal.resizePixels(media, ow = 3, oh = 2)
  }

  val q124Sql: String =
    """WITH g AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
      |                  CAST(3 + doc_id % 4 AS INT) AS h FROM documents),
      |p1 AS (SELECT doc_id, w, h, unnest([0, 1]) AS r FROM g),
      |p2 AS (SELECT doc_id, w, h, r, unnest([0, 1, 2]) AS c FROM p1)
      |SELECT doc_id AS media_id, CAST(r AS INT) AS r, CAST(c AS INT) AS c,
      |  CAST((doc_id*31 + (r*h//2)*7 + (c*w//3)*3) % 256 AS INT) AS red,
      |  CAST((doc_id*31 + (r*h//2)*7 + (c*w//3)*3 + 11) % 256 AS INT) AS green,
      |  CAST((doc_id*31 + (r*h//2)*7 + (c*w//3)*3 + 22) % 256 AS INT) AS blue
      |FROM p2""".stripMargin

  /** Video frame statistics over REAL AVI containers: each document
    * carries a [[graft.multimodal.Multimodal.syntheticAviPattern]] clip
    * (nested RIFF assembled in Column byte math; uncompressed 24-bit DIB
    * frames from a deterministic per-frame pixel formula), decoded from
    * first principles by [[graft.multimodal.AviDecode]] (container walk +
    * the BMP pixel-walk semantics per frame) — one row per frame with
    * channel means and the position probes that expose bottom-up/BGR
    * normalization bugs. The oracle replays the formula over the
    * (frame, row, col, channel) grid, never touching bytes.
    */
  def q125VideoFrames(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(2) + col("doc_id") % 4).cast("int")
    val h = (lit(2) + col("doc_id") % 3).cast("int")
    val f = (lit(1) + col("doc_id") % 3).cast("int")
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticAviPattern(col("doc_id"), w, h, f)
        .as("payload"))
    graft.multimodal.Multimodal.videoFrameStats(media)
  }

  val q125Sql: String =
    """WITH g AS (SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS w,
      |    CAST(2 + doc_id % 3 AS INT) AS h, 1 + doc_id % 3 AS nf FROM documents),
      |f1 AS (SELECT doc_id, w, h, unnest(generate_series(0, CAST(nf-1 AS BIGINT))) AS f FROM g),
      |p1 AS (SELECT doc_id, w, h, f, unnest(generate_series(0, CAST(h-1 AS BIGINT))) AS r FROM f1),
      |p2 AS (SELECT doc_id, w, h, f, r, unnest(generate_series(0, CAST(w-1 AS BIGINT))) AS c FROM p1),
      |px AS (SELECT doc_id, w, h, f, r, c, unnest([0, 1, 2]) AS ch FROM p2),
      |pv AS (SELECT doc_id, w, h, f, r, c, ch,
      |    CAST((doc_id*31 + f*17 + r*7 + c*3 + ch*11) % 256 AS INT) AS v FROM px)
      |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
      |  w AS width, h AS height,
      |  CAST(sum(CASE WHEN ch = 0 THEN v END) AS DOUBLE) / (w*h) AS r_mean,
      |  CAST(sum(CASE WHEN ch = 1 THEN v END) AS DOUBLE) / (w*h) AS g_mean,
      |  CAST(sum(CASE WHEN ch = 2 THEN v END) AS DOUBLE) / (w*h) AS b_mean,
      |  CAST(max(CASE WHEN r = 0 AND c = 0 AND ch = 0 THEN v END) AS INT)
      |    AS top_left_r,
      |  CAST(max(CASE WHEN r = h-1 AND c = w-1 AND ch = 2 THEN v END) AS INT)
      |    AS bottom_right_b
      |FROM pv GROUP BY doc_id, f, w, h""".stripMargin

  /** Composite product-analytics dashboard — the report a training-data
    * curation pipeline runs over its interaction telemetry: per 7-day
    * cohort, size + week-1 retention ([[graft.operators.Retention]]),
    * mean 12-hour-gap session count per user (gaps-and-islands, the batch
    * analogue of q55's streaming sessionize), and the rate of users
    * completing the ordered view→click→purchase funnel within 7 days
    * ([[graft.operators.Funnel.completions]]). Three operator families
    * composed through user-keyed joins — cohort-cardinality relations
    * only, the event stream is never collected or globally windowed.
    *
    * The fact table is deliberately scanned once per leg (each leg prunes
    * to 2-3 columns at the parquet reader): at 100 TB, re-scanning a
    * column-pruned fact beats materializing a projected copy the legs
    * would share — a localCheckpoint of the fact is corpus-sized (and
    * single-replica), and a lake write round-trip only wins when many
    * more than four consumers share it.
    */
  def q101CurationDashboard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketNs = 7L * 86400L * 1000000000L
    val gapNs = 12L * 3600L * 1000000000L
    val evRaw = Tables.events(s, dir)
    val ret = graft.operators.Retention.report(evRaw, "user_id", "ts_ns", bucketNs)
    val sizes = ret.select(col("cohort_bucket"), col("n_cohort")).distinct()
    val w1 = ret.filter(col("bucket_offset") === 1)
      .select(col("cohort_bucket"), col("n_active").as("w1_active"))
    val ev = evRaw.select(col("user_id").as("u"), col("ts_ns").cast("long").as("t"))
    val cohorts = ev.groupBy(col("u"))
      .agg(expr(s"min(t) div $bucketNs").as("cohort_bucket"))
    val byUser = Window.partitionBy(col("u")).orderBy(col("t"))
    val sess = ev.withColumn("pt", lag(col("t"), 1).over(byUser))
      .groupBy(col("u"))
      .agg((lit(1L) + sum(when(col("t") - col("pt") > gapNs, 1L).otherwise(0L)))
        .as("n_sessions"))
    val meanSess = cohorts.join(sess, Seq("u"))
      .groupBy(col("cohort_bucket"))
      .agg(round(sum(col("n_sessions")).cast("double") / count(lit(1)), 6)
        .as("mean_sessions_r"))
    val completed = graft.operators.Funnel.completions(evRaw, "user_id",
      "event_type", "ts_ns", Seq("view", "click", "purchase"), bucketNs)
    val rate = completed.select(col("u")).join(cohorts, Seq("u"))
      .groupBy(col("cohort_bucket")).agg(count(lit(1)).as("n_completed"))
    sizes
      .join(w1, Seq("cohort_bucket"), "left")
      .join(meanSess, Seq("cohort_bucket"), "left")
      .join(rate, Seq("cohort_bucket"), "left")
      .select(col("cohort_bucket"), col("n_cohort"),
        coalesce(col("w1_active"), lit(0L)).as("w1_active"),
        round(coalesce(col("w1_active"), lit(0L)) /
          col("n_cohort").cast("double"), 9).as("w1_retention_r"),
        coalesce(col("mean_sessions_r"), lit(0.0)).as("mean_sessions_r"),
        round(coalesce(col("n_completed"), lit(0L)) /
          col("n_cohort").cast("double"), 6).as("funnel_rate_r"))
  }

  val q101Sql: String =
    """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_ns(ts) AS t FROM events),
      |coh AS (SELECT u, min(t) // 604800000000000 AS cb FROM e GROUP BY 1),
      |sizes AS (SELECT cb, CAST(count(*) AS BIGINT) AS n_cohort FROM coh GROUP BY 1),
      |w1 AS (SELECT c.cb, CAST(count(DISTINCT e.u) AS BIGINT) AS w1_active
      |       FROM e JOIN coh c ON e.u = c.u
      |       WHERE (e.t // 604800000000000) - c.cb = 1 GROUP BY 1),
      |sess AS (SELECT u, 1 + sum(CASE WHEN t - pt > 43200000000000 THEN 1 ELSE 0 END) AS ns
      |         FROM (SELECT u, t, lag(t) OVER (PARTITION BY u ORDER BY t) AS pt FROM e)
      |         GROUP BY 1),
      |ms AS (SELECT c.cb, round(CAST(sum(s.ns) AS DOUBLE) / count(*), 6) AS mean_sessions_r
      |       FROM coh c JOIN sess s ON c.u = s.u GROUP BY 1),
      |s0 AS (SELECT u, min(t) AS t0 FROM e WHERE et = 'view' GROUP BY 1),
      |s1 AS (SELECT e.u, min(s0.t0) AS t0, min(e.t) AS t1 FROM e JOIN s0 ON e.u = s0.u
      |       WHERE e.et = 'click' AND e.t > s0.t0 AND e.t <= s0.t0 + 604800000000000
      |       GROUP BY e.u),
      |s2 AS (SELECT e.u FROM e JOIN s1 ON e.u = s1.u
      |       WHERE e.et = 'purchase' AND e.t > s1.t1 AND e.t <= s1.t0 + 604800000000000
      |       GROUP BY e.u),
      |fr AS (SELECT c.cb, CAST(count(*) AS BIGINT) AS n_completed
      |       FROM s2 JOIN coh c ON s2.u = c.u GROUP BY 1)
      |SELECT z.cb AS cohort_bucket, z.n_cohort,
      |  COALESCE(w1.w1_active, 0) AS w1_active,
      |  round(COALESCE(w1.w1_active, 0) / CAST(z.n_cohort AS DOUBLE), 9) AS w1_retention_r,
      |  COALESCE(ms.mean_sessions_r, 0.0) AS mean_sessions_r,
      |  round(COALESCE(fr.n_completed, 0) / CAST(z.n_cohort AS DOUBLE), 6) AS funnel_rate_r
      |FROM sizes z
      |LEFT JOIN w1 ON z.cb = w1.cb
      |LEFT JOIN ms ON z.cb = ms.cb
      |LEFT JOIN fr ON z.cb = fr.cb""".stripMargin

  /** Per-source document cap ([[graft.operators.Assembly.capPerGroup]]):
    * at most 10 docs per source by md5 priority, on the TopKPerKey
    * bounded-heap operator (partial top-k before the shuffle — the
    * per-domain cap posture for a corpus where one domain dominates).
    */
  def q102SourceCaps(s: SparkSession, dir: String): DataFrame =
    graft.operators.Assembly.capPerGroup(
      Tables.documents(s, dir).select(col("doc_id"), col("source")),
      "source", "doc_id", k = 10)
      .select(col("doc_id"), col("source"), col("priority"))

  val q102Sql: String =
    """SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS priority
      |FROM documents
      |QUALIFY row_number() OVER (PARTITION BY source
      |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) <= 10""".stripMargin

  /** Event-type transition matrix ([[graft.operators.Paths.transitions]]):
    * one user-keyed lag window, pair counts with map-side partials, and a
    * broadcast join against the (type-cardinality) per-prev totals.
    */
  def q103EventTransitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Paths.transitions(
      Tables.events(s, dir), "user_id", "ts_ns", "event_id", "event_type")

  val q103Sql: String =
    """WITH e AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_transitions
      |  FROM e WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev_type, sum(n_transitions) AS tot FROM c GROUP BY 1)
      |SELECT c.prev_type, c.event_type, c.n_transitions,
      |  round(c.n_transitions / CAST(t.tot AS DOUBLE), 9) AS share_r
      |FROM c JOIN t USING (prev_type)""".stripMargin

  /** Top opening paths ([[graft.operators.Paths.topPaths]]): first 3 event
    * types per user (row_number-bounded BEFORE the collect), path counts,
    * global top-20 over the already-aggregated path relation.
    */
  def q104TopPaths(s: SparkSession, dir: String): DataFrame =
    graft.operators.Paths.topPaths(
      Tables.events(s, dir), "user_id", "ts_ns", "event_id", "event_type",
      pathLen = 3, k = 20)

  val q104Sql: String =
    """WITH e AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (SELECT user_id, string_agg(event_type, ' > ' ORDER BY rn) AS path
      |  FROM e WHERE rn <= 3 GROUP BY user_id),
      |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY 1),
      |t AS (SELECT count(*) AS tot FROM p)
      |SELECT path, n_users, round(n_users / CAST(tot AS DOUBLE), 9) AS share_r
      |FROM c, t ORDER BY n_users DESC, path ASC LIMIT 20""".stripMargin

  /** BPE merge application ([[graft.text.BpeEncoder]]): encode every
    * document against a fixed rank-ordered merge table (pairs chosen
    * over the fixture's common-word adjacencies so the gate is selective
    * at every SF). The Spark side runs the true min-rank fixpoint loop;
    * because no rule's output can be a rule operand (outputs contain a
    * space, operands are single words), that loop provably equals one
    * greedy-leftmost replace-all pass per rule in rank order — which is
    * what the oracle replays with a bracket-delimited replace chain.
    */
  def q105BpeEncode(s: SparkSession, dir: String): DataFrame =
    graft.text.BpeEncoder.encodeStats(
      Tables.documents(s, dir), "text", "doc_id", q105Merges)

  private val q105Merges = Seq(
    ("table", "hash"), ("a", "the"), ("sort", "query"), ("value", "spark"))

  val q105Sql: String =
    """WITH b AS (SELECT doc_id AS id,
      |    '<' || array_to_string(string_split_regex(trim(lower(text)), '\s+'), '><') || '>' AS s,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS n_words
      |  FROM documents),
      |e AS (SELECT id, n_words,
      |    replace(replace(replace(replace(s,
      |      '<table><hash>', '<table hash>'),
      |      '<a><the>', '<a the>'),
      |      '<sort><query>', '<sort query>'),
      |      '<value><spark>', '<value spark>') AS s2
      |  FROM b),
      |c AS (SELECT id, n_words,
      |    len(s2) - len(replace(s2, '<', '')) AS n_tokens FROM e)
      |SELECT id, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_words - n_tokens AS BIGINT) AS n_merged
      |FROM c""".stripMargin

  /** RFM user segmentation: per-user recency (last event), frequency
    * (event count), monetary (exact cents), each cut into quartiles, then
    * segment rollups. The quartile is NTILE(4) — but computed from a
    * [[graft.operators.GlobalOrder]] distributed rank plus the explicit
    * ntile remainder formula instead of a global window, so the
    * user-cardinality relation is never moved to one task (the formula is
    * replayed verbatim in the oracle, so both engines share one
    * definition rather than trusting two NTILE implementations to agree).
    */
  def q106RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts_ns")).as("recency_ns"),
        count(lit(1)).as("frequency"),
        sum(round(col("value") * 100).cast("long")).as("monetary_cents"))
    val n = users.agg(count(lit(1)).as("n_users_total"))
    // quartile of `metric` over the global (metric, user_id) order; higher
    // recency/frequency/monetary should score higher, so rank ascending
    // and the bucket index IS the score (1 = lowest quartile)
    def withQuartile(df: DataFrame, metric: String, out: String): DataFrame = {
      val ranked = graft.operators.GlobalOrder
        .runningRowNumber(df, Seq(metric, "user_id"), "__rank")
        .crossJoin(broadcast(n))
      ranked.withColumn(out, ntileFromRank(col("__rank"), col("n_users_total"), 4))
        .drop("__rank", "n_users_total")
    }
    val scored = withQuartile(
      withQuartile(withQuartile(users, "recency_ns", "r_q"),
        "frequency", "f_q"),
      "monetary_cents", "m_q")
    scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary_cents")).as("segment_cents"))
  }

  /** NTILE(k) from a 1-based global rank: the first (n mod k) buckets
    * take ceil(n/k) rows, the rest floor(n/k) — the standard remainder
    * rule, written once and shared with the SQL oracle.
    */
  private[queries] def ntileFromRank(rank: Column, nRows: Column, k: Int): Column = {
    val base = nRows.divide(k).cast("long")           // floor(n/k)
    val rem = nRows % k
    val cut = rem * (base + 1)                        // rows in the fat buckets
    // n < k → base == 0: the otherwise-branch would divide by zero (double
    // Infinity → cast long → garbage buckets, silently). NTILE then gives
    // each of the n rows its own bucket: bucket = rank.
    when(base === 0, rank)
      .when(rank <= cut, (rank - 1).divide(base + 1).cast("long") + 1)
      .otherwise(rem + (rank - cut - 1).divide(base).cast("long") + 1)
      .cast("int")
  }

  val q106Sql: String =
    """WITH u AS (SELECT user_id, max(ts) AS recency,
      |    CAST(count(*) AS BIGINT) AS frequency,
      |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM events GROUP BY 1),
      |p AS (SELECT count(*) AS n FROM u),
      |r AS (SELECT u.*, n,
      |    row_number() OVER (ORDER BY recency, user_id) AS rr,
      |    row_number() OVER (ORDER BY frequency, user_id) AS fr,
      |    row_number() OVER (ORDER BY monetary_cents, user_id) AS mr
      |  FROM u, p),
      |q AS (SELECT monetary_cents,
      |    CASE WHEN rr <= (n % 4) * (n // 4 + 1)
      |      THEN (rr - 1) // (n // 4 + 1) + 1
      |      ELSE n % 4 + (rr - (n % 4) * (n // 4 + 1) - 1) // (n // 4) + 1 END AS r_q,
      |    CASE WHEN fr <= (n % 4) * (n // 4 + 1)
      |      THEN (fr - 1) // (n // 4 + 1) + 1
      |      ELSE n % 4 + (fr - (n % 4) * (n // 4 + 1) - 1) // (n // 4) + 1 END AS f_q,
      |    CASE WHEN mr <= (n % 4) * (n // 4 + 1)
      |      THEN (mr - 1) // (n // 4 + 1) + 1
      |      ELSE n % 4 + (mr - (n % 4) * (n // 4 + 1) - 1) // (n // 4) + 1 END AS m_q
      |  FROM r)
      |SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
      |  CAST(m_q AS INT) AS m_q,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
      |FROM q GROUP BY 1, 2, 3""".stripMargin

  /** The END-TO-END curation pipeline, one DAG: exact dedup → near-dup
    * removal → quality gate → per-source caps → corpus manifest. Every
    * stage is an operator gated on its own elsewhere (q25/q27/q80/q102);
    * this query proves they COMPOSE — the thing a user actually runs.
    *
    * Non-vacuity by construction: every 20th doc re-arrives as a clone
    * under a new id (the daily-batch duplicate shape — stage 1 must drop
    * them at any SF); the quality thresholds are tuned to the fixture's
    * metric distributions so each predicate filters a real slice
    * (mean_word_len p90≈4.77, dup_bigram_frac p90≈0.13, n_tokens
    * p10≈21); caps bite at k=8 < docs-per-source. The LSH leg's
    * recall-complete argument is exactly q27's: stage 1 removes only the
    * clones, so the near-dup input is the original corpus.
    */
  def q109CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = Tables.documents(s, dir).select(
      col("doc_id"), col("source"), col("text"))
    val clones = raw.filter(col("doc_id") % 20 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val docs = raw.unionByName(clones)

    // 1. exact dedup: min id per content hash
    val w = Window.partitionBy(col("content_hash"))
    val exactKept = docs.withColumn("content_hash", md5(col("text")))
      .withColumn("__min", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("__min"))
      .drop("__min", "content_hash")

    // 2. near-dup removal: LSH candidates + exact verify (q27 parameters),
    // drop the higher id of each verified pair
    val dup = graft.operators.Dedup
      .nearDuplicates(exactKept, "text", "doc_id",
        threshold = 0.2, numHashes = 32, bands = 8)
      .select(col("id_b").as("doc_id")).distinct()
    val nearKept = exactKept.join(dup, Seq("doc_id"), "left_anti")

    // 3. pipeline-tuned quality gate over the survivors
    val quality = graft.text.QualityFilters
      .gopherStats(nearKept, "text", "doc_id")
      .filter(col("mean_word_len") <= 4.6 &&
        col("dup_bigram_frac") <= 0.10 && col("n_tokens") >= 25)
      .select(col("id").as("doc_id"))
    val qualityKept = nearKept.join(quality, Seq("doc_id"), "left_semi")

    // 4. per-source caps on the TopKPerKey bounded heaps
    val capped = graft.operators.Assembly
      .capPerGroup(qualityKept, "source", "doc_id", k = 8)

    // 5. manifest
    capped.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(graft.text.TextFunctions.tokens(col("text"))))
        .cast("long").as("total_tokens"))
  }

  val q109Sql: String =
    """WITH raw AS (SELECT doc_id, source, text FROM documents),
      |all_docs AS (SELECT * FROM raw UNION ALL
      |  SELECT doc_id + 1000000, source, text FROM raw WHERE doc_id % 20 = 0),
      |ek AS (SELECT doc_id, source, text FROM (
      |  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM all_docs)
      |  WHERE doc_id = mn),
      |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM ek),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
      |    i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))) AS shingle FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |dup AS (SELECT DISTINCT id_b AS doc_id FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  WHERE shared*1.0/(sa.n + sb.n - shared) >= 0.2),
      |nk AS (SELECT * FROM ek WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
      |t2 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM nk),
      |tok AS (SELECT doc_id, unnest(t) AS tok FROM t2),
      |uni0 AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |uni AS (SELECT doc_id, sum(c) AS n_tokens, sum(len(tok)*c) AS char_sum
      |  FROM uni0 GROUP BY 1),
      |bg0 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      |    THEN list_transform(generate_series(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1]))
      |    ELSE CAST([] AS VARCHAR[]) END) AS bg FROM t2),
      |bi0 AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
      |bi AS (SELECT doc_id, sum(c) AS n_bigrams,
      |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bigram_c FROM bi0 GROUP BY 1),
      |qk AS (SELECT u.doc_id FROM uni u LEFT JOIN bi USING (doc_id)
      |  WHERE char_sum*1.0/n_tokens <= 4.6
      |    AND coalesce(dup_bigram_c, 0)*1.0/coalesce(n_bigrams, 1) <= 0.10
      |    AND n_tokens >= 25),
      |kept AS (SELECT nk.* FROM nk JOIN qk USING (doc_id)),
      |capped AS (SELECT * FROM kept QUALIFY row_number() OVER (PARTITION BY source
      |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) <= 8)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS total_tokens
      |FROM capped GROUP BY 1""".stripMargin

  /** Persisted ANN index ([[graft.operators.AnnIndex]]): build the IVF
    * index once (cell-partitioned parquet), then probe it with a fresh
    * query batch — nothing shared in memory between build and probe, the
    * lifecycle a daily vector-search pipeline runs. Same deterministic
    * fixture centroids as q54; corpus excludes the query slice so probes
    * exercise pure index lookups.
    */
  private val builtIndexes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def q110AnnIndexProbe(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // The index root is keyed on a CONTENT fingerprint of the corpus
    // (count + max id + order-insensitive xxhash64 xor — one cheap
    // column-pruned scan), not the fixture path: a path-keyed root served
    // a STALE index when a long-lived session saw the corpus change under
    // the same path (and /tmp outlives the JVM, while the guard set does
    // not). A changed corpus now hashes to a fresh root and rebuilds;
    // an unchanged one keeps hitting the built index.
    val fp = emb.agg(
        count(lit(1)), coalesce(max(col("vec_id")).cast("long"), lit(0L)),
        coalesce(bit_xor(xxhash64(col("vec_id"), col("embedding"))), lit(0L)))
      .first()
    val root = "/tmp/graft_q110_index_" + math.abs(
      java.util.Objects.hash(fp.getLong(0), fp.getLong(1), fp.getLong(2)))
    // index built ONCE per corpus (the stageOnce discipline): the probe is
    // the recurring operation a daily batch runs and the one the bench
    // should price; un-cache on failure so a half-written index is never
    // served to the next caller
    if (builtIndexes.add(root)) {
      try {
        val cents = emb.filter(col("vec_id") % 100 === 50)
          .select(col("vec_id").cast("long").as("cell"),
            transform(col("embedding"), x => x.cast("double")).as("centroid"))
        graft.operators.AnnIndex.build(
          emb.filter(col("vec_id") % 100 =!= 0), cents, root)
      } catch { case e: Throwable => builtIndexes.remove(root); throw e }
    }
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") % 100 === 0)
    graft.operators.AnnIndex.probe(s, root, queries, k = 10, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos_sim_r"), col("rank"))
  }

  val q110Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id % 100 = 50),
      |assign AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT e.vec_id, e.v, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, c.cv) /
      |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM e, cents c WHERE e.vec_id % 100 <> 0)
      |  WHERE rn = 1),
      |qcells AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, c.cv) /
      |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cell ASC) AS rn
      |    FROM e, cents c WHERE e.vec_id % 100 = 0)
      |  WHERE rn <= 4),
      |scored AS (
      |  SELECT q.query_id, a.vec_id AS neighbor_id,
      |    list_dot_product(a.v, q.qv) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
      |  FROM assign a JOIN qcells q USING (cell)),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim_r, rank
      |FROM ranked WHERE rank <= 10""".stripMargin

  /** IVF-PQ ([[graft.operators.ProductQuantization.ivfAdcTopK]]): q54's
    * cell routing composed with q96's ADC scoring — candidates come from
    * the inverted cell index (≈ nprobe/nlist of the corpus per query) and
    * only they are ADC-scored. Same deterministic fixture centroids,
    * seeds, and integer-nano distance chain as the two parents, so the
    * oracle is their SQL composed.
    */
  /** STREAMING ANN probe — the last index family to get a streaming
    * shape (text shingles have q188, media hashes q193): the IVF index
    * is built ONCE (persisted cell-partitioned parquet, q110's layout),
    * then query vectors ARRIVE as a file stream and every micro-batch
    * probes the stored index via [[graft.operators.AnnIndex.probe]],
    * appending its top-k verdicts to the sink. Verdicts are PER-QUERY
    * against a static index, so the sink is batch-boundary-independent
    * and the oracle is exactly q110's SQL replay. Checkpointed
    * AvailableNow, ≥ 2 micro-batches via maxFilesPerTrigger.
    */
  def q196StreamingAnnProbe(s: SparkSession, dir: String): DataFrame = {
    val h = math.abs(dir.hashCode)
    val root = s"/tmp/graft_q196_idx_$h"
    val src = s"/tmp/graft_q196_src_$h"
    val sink = s"/tmp/graft_q196_sink_$h"
    val ckpt = s"${graft.LocalScratch.dir()}/graft_q196_ckpt_$h"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    Seq(root, src, sink, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val emb = Tables.embeddings(s, dir)
    // q110's fixture geometry: %100==50 seed centroids, corpus excludes
    // the query slice, queries are %100==0
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    graft.operators.AnnIndex.build(
      emb.filter(col("vec_id") % 100 =!= 0), cents, root)
    // the query batch lands as 4 files → 2 micro-batches of 2
    emb.filter(col("vec_id") % 100 === 0).select("vec_id", "embedding")
      .repartition(4).write.parquet(src)
    import org.apache.spark.sql.types._
    val stream = graft.streaming.Incremental.fileStream(s, src,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))),
      maxFilesPerTrigger = Some(2))
    graft.streaming.Incremental.runForeachBatchToParquet(stream, sink, ckpt,
      (batch, _) => graft.operators.AnnIndex
        .probe(batch.sparkSession, root, batch, k = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 9).as("cos_sim_r"), col("rank")))
    s.read.parquet(sink)
  }

  def q111IvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ProductQuantization._
    val emb = Tables.embeddings(s, dir)
    val seeds = emb.filter(col("vec_id") % 25 === 3).orderBy(col("vec_id")).limit(16)
    val cb = codebooksFromSeeds(seeds, m = 8, subDim = 8)
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    ivfAdcTopK(emb, emb.filter(col("vec_id") % 100 === 0), cents, cb,
      k = 10, m = 8, subDim = 8, nprobe = 4)
  }

  val q111Sql: String = {
    val fold = (a: String, b: String) =>
      s"""CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(generate_series(1, 8), j -> ($a[j]-$b[j])*($a[j]-$b[j]))),
         |      (acc, x) -> acc + x) * 1e9) AS BIGINT)""".stripMargin
    val cos = (a: String, b: String) =>
      s"""list_dot_product($a, $b) /
         |        (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
       |seeds AS (SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT) AS code
       |          FROM (SELECT vec_id, v FROM e WHERE vec_id % 25 = 3 ORDER BY vec_id ASC LIMIT 16) s0),
       |cb AS (SELECT CAST(s.sub AS BIGINT) AS sub, seeds.code,
       |         seeds.v[s.sub*8+1 : s.sub*8+8] AS cvec
       |       FROM seeds, subs s),
       |cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id % 100 = 50),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cos("e.v", "c.cv")} DESC, c.cell ASC) AS rn
       |    FROM e, cents c)
       |  WHERE rn = 1),
       |qcells AS (
       |  SELECT query_id, cell FROM (
       |    SELECT e.vec_id AS query_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cos("e.v", "c.cv")} DESC, c.cell ASC) AS rn
       |    FROM e, cents c WHERE e.vec_id % 100 = 0)
       |  WHERE rn <= 4),
       |cand AS (SELECT a.vec_id AS id, q.query_id
       |  FROM assign a JOIN qcells q USING (cell)
       |  WHERE a.vec_id <> q.query_id),
       |sv AS (SELECT e.vec_id AS id, CAST(s.sub AS BIGINT) AS sub,
       |         e.v[s.sub*8+1 : s.sub*8+8] AS svec
       |       FROM e, subs s),
       |enc AS (SELECT id, sub, code FROM (
       |    SELECT sv.id, sv.sub, cb.code,
       |      row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
       |        ${fold("sv.svec", "cb.cvec")} ASC, cb.code ASC) AS rn
       |    FROM sv JOIN cb USING (sub)) r
       |  WHERE rn = 1),
       |lut AS (SELECT q.query_id, cb.sub, cb.code, ${fold("q.qsub", "cb.cvec")} AS d_nano
       |  FROM (SELECT e.vec_id AS query_id, CAST(s.sub AS BIGINT) AS sub,
       |          e.v[s.sub*8+1 : s.sub*8+8] AS qsub
       |        FROM e, subs s WHERE e.vec_id % 100 = 0) q
       |  JOIN cb ON q.sub = cb.sub),
       |scored AS (SELECT c.query_id, c.id AS neighbor_id,
       |    CAST(sum(d_nano) AS BIGINT) AS adc_nano
       |  FROM cand c
       |  JOIN enc ON enc.id = c.id
       |  JOIN lut l ON l.query_id = c.query_id AND enc.sub = l.sub AND enc.code = l.code
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, neighbor_id, adc_nano,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc_nano ASC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc_nano / 1e9 AS adc_r, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 10""".stripMargin
  }

  /** Temperature-flattened domain mixing
    * ([[graft.operators.Assembly.temperatureMixSqrt]]): α = 0.5 quotas
    * over per-source character mass, budget 300 — binding at every SF
    * (quota < docs-per-source), and sqrt keeps the quota math IEEE-exact
    * in both engines (pow would drift in the last ulp).
    */
  def q112TemperatureMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Assembly.temperatureMixSqrt(
      Tables.documents(s, dir), "source", "doc_id", "n_chars", budget = 300L)

  val q112Sql: String =
    """WITH m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1),
      |z AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list(sqrt(mass) ORDER BY source)), (acc, x) -> acc + x) AS z FROM m),
      |q AS (SELECT m.source, m.mass,
      |    CAST(floor(300 * sqrt(m.mass) / z.z) AS BIGINT) AS quota FROM m, z),
      |r AS (SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
      |  FROM documents)
      |SELECT q.source, q.mass, q.quota,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN r.rk <= q.quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM r JOIN q USING (source) GROUP BY 1, 2, 3""".stripMargin

  val queries: Map[String, Q] = Map(
    "q100_pixel_stats" -> (q100PixelStats _),
    "q123_audio_features" -> (q123AudioFeatures _),
    "q124_image_resize" -> (q124ImageResize _),
    "q125_video_frames" -> (q125VideoFrames _),
    "q105_bpe_encode" -> (q105BpeEncode _),
    "q111_ivf_pq" -> (q111IvfPq _),
    "q112_temperature_mix" -> (q112TemperatureMix _),
    "q106_rfm_segments" -> (q106RfmSegments _),
    "q109_curation_pipeline" -> (q109CurationPipeline _),
    "q110_ann_index_probe" -> (q110AnnIndexProbe _),
    "q196_streaming_ann_probe" -> (q196StreamingAnnProbe _),
    "q102_source_caps" -> (q102SourceCaps _),
    "q103_event_transitions" -> (q103EventTransitions _),
    "q104_top_paths" -> (q104TopPaths _),
    "q101_curation_dashboard" -> (q101CurationDashboard _),
    "q94_dup_spans" -> (q94DupSpans _),
    "q95_hashed_classifier" -> (q95HashedClassifier _),
    "q96_pq_adc" -> (q96PqAdc _),
    "q97_funnel" -> (q97Funnel _),
    "q98_retention" -> (q98Retention _),
    "q99_random_projection" -> (q99RandomProjection _))

  val oracleSql: Map[String, String] = Map(
    "q100_pixel_stats" -> q100Sql,
    "q123_audio_features" -> q123Sql,
    "q124_image_resize" -> q124Sql,
    "q125_video_frames" -> q125Sql,
    "q102_source_caps" -> q102Sql,
    "q105_bpe_encode" -> q105Sql,
    "q106_rfm_segments" -> q106Sql,
    "q109_curation_pipeline" -> q109Sql,
    "q110_ann_index_probe" -> q110Sql,
    "q196_streaming_ann_probe" -> q110Sql, // batch-boundary-independent: q110's replay
    "q111_ivf_pq" -> q111Sql,
    "q112_temperature_mix" -> q112Sql,
    "q103_event_transitions" -> q103Sql,
    "q104_top_paths" -> q104Sql,
    "q101_curation_dashboard" -> q101Sql,
    "q94_dup_spans" -> q94Sql,
    "q95_hashed_classifier" -> q95Sql,
    "q96_pq_adc" -> q96Sql,
    "q97_funnel" -> q97Sql,
    "q98_retention" -> q98Sql,
    "q99_random_projection" -> q99Sql)
}
