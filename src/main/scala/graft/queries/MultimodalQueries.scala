package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash dedup gates: image dHash and audio energy-contour
  * fingerprints over Column-assembled synthetic media (the established
  * formula-replay pattern — the oracle recomputes every hash from the
  * generating formula without ever touching bytes, so a defect in the
  * encoder, the decoder walk, the resize arithmetic, the framing, the
  * bit packing, OR the banded Hamming join breaks the hash).
  *
  * Both gates plant exact clones via seed folding (doc_id % P), so
  * dist-0 pairs MUST surface, and leave cross-seed near-pairs to the
  * deterministic wraparound structure — the oracle is the brute-force
  * all-pairs ground truth, so the pigeonhole candidate generation is
  * proven COMPLETE, not just plausible.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Image near-dup pairs by 56-bit dHash ([[graft.multimodal
    * .ImageHash]]) over %83-seeded BMPs (8..16 × 8..14 px), Hamming ≤ 2
    * via 4-band pigeonhole + exact popcount.
    */
  def q167ImageDhash(s: SparkSession, dir: String): DataFrame = {
    // copy-distinct seeds under the 10^8-stride blowup: a plain %83 would
    // repeat the SAME 83 images in every blown-up copy and make the pair
    // relation quadratic in copies (corpus densification, not operator
    // cost); folding the copy index in keeps per-copy structure identical
    // and cross-copy images disjoint. Payload synthesis is cached once
    // per fixture (MediaFixtures) so the gate times decode+hash+join.
    val media = MediaFixtures.bmpScramble83(s, dir)
    graft.multimodal.ImageHash.nearDuplicates(media, maxDist = 2)
      .select("id_a", "id_b", "h_a", "h_b", "dist")
  }

  val q167Sql: String =
    """WITH g0 AS (SELECT doc_id,
      |    doc_id % 83 + (doc_id // 100000000) * 83 AS seed FROM documents),
      |g AS (SELECT doc_id, seed,
      |    CAST(8 + seed % 9 AS BIGINT) AS w,
      |    CAST(8 + seed % 7 AS BIGINT) AS h
      |  FROM g0),
      |px AS (SELECT doc_id, rr.r AS r, cc.c AS c,
      |    ('0x' || substr(md5(concat_ws('_', seed,
      |      (rr.r*h)//8, (cc.c*w)//8)), 3, 2))::INT AS gray
      |  FROM g,
      |    (SELECT unnest(generate_series(0, 7)) AS r) rr,
      |    (SELECT unnest(generate_series(0, 7)) AS c) cc),
      |bits AS (SELECT a.doc_id, a.r, a.c,
      |    CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.r = b.r
      |    AND b.c = a.c + 1
      |  WHERE a.c <= 6),
      |hs AS (SELECT doc_id,
      |    CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(r*7 + c AS INT)))
      |      AS BIGINT) AS h
      |  FROM bits GROUP BY 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.h AS h_a, b.h AS h_b,
      |  CAST(bit_count(xor(a.h, b.h)) AS INT) AS dist
      |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.h, b.h)) <= 2""".stripMargin

  /** Audio near-dup pairs by 63-bit energy-contour fingerprint
    * ([[graft.multimodal.AudioHash]]) over %89-seeded 1024-sample PCM
    * clips (64 frames of 16), Hamming ≤ 2; 63-bit hash.
    */
  def q168AudioFingerprint(s: SparkSession, dir: String): DataFrame = {
    // copy-distinct seeds — same rationale as q167; synthesis cached once
    val media = MediaFixtures.wavScramble89(s, dir)
    graft.multimodal.AudioHash.nearDuplicates(media, maxDist = 2)
      .select("id_a", "id_b", "h_a", "h_b", "dist")
  }

  val q168Sql: String =
    """WITH sam AS (SELECT seed, i,
      |    (('0x' || substr(md5(concat_ws('_', seed, i)), 1, 3))::INT
      |      % 2048) - 1024 AS s
      |  FROM (SELECT DISTINCT doc_id % 89 + (doc_id // 100000000) * 89 AS seed
      |      FROM documents),
      |    (SELECT unnest(generate_series(0, 1023)) AS i) ii),
      |en AS (SELECT seed, i // 16 AS f, CAST(sum(s*s) AS BIGINT) AS e
      |  FROM sam GROUP BY 1, 2),
      |bits AS (SELECT a.seed, a.f,
      |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      |  FROM en a JOIN en b ON a.seed = b.seed AND b.f = a.f + 1
      |  WHERE a.f <= 62),
      |hs0 AS (SELECT seed,
      |    CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(f AS INT))) AS BIGINT)
      |      AS fp
      |  FROM bits GROUP BY 1),
      |hs AS (SELECT doc_id, fp FROM
      |  (SELECT doc_id, doc_id % 89 + (doc_id // 100000000) * 89 AS seed
      |    FROM documents) dd
      |  JOIN hs0 USING (seed))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS h_a, b.fp AS h_b,
      |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS dist
      |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fp, b.fp)) <= 2""".stripMargin

  /** Video temporal near-dup ([[graft.multimodal.VideoHash]]): %97-seeded
    * AVI clips (4-5 frames of md5-scramble content), where same-seed
    * clips render the SAME content sequence at different temporal phases
    * — shifted clones the alignment must recover with the right offset.
    * Candidates via banded pigeonhole on per-frame dHashes; verification
    * counts aligned positions within Hamming ≤ 2 at offsets ±2 and keeps
    * pairs with ≥ 2 matches at the best offset. The oracle is the
    * brute-force all-pairs × all-offsets ground truth (the q167
    * discipline), so candidate completeness is proven, not plausible.
    */
  def q184VideoNearDup(s: SparkSession, dir: String): DataFrame = {
    // copy-distinct seeds (q167 rationale); phase from the WITHIN-copy id
    // so each copy carries the same shifted-clone structure; synthesis
    // cached once per fixture (MediaFixtures)
    val media = MediaFixtures.aviScramble97(s, dir)
    graft.multimodal.VideoHash.nearDuplicates(media,
        maxDist = 2, maxOffset = 2, minMatch = 2)
      .select("id_a", "id_b", "offset", "matched")
  }

  val q184Sql: String =
    """WITH g0 AS (SELECT doc_id,
      |    doc_id % 97 + (doc_id // 100000000) * 97 AS seed,
      |    ((doc_id % 100000000) // 97) % 3 AS phase FROM documents),
      |g AS (SELECT doc_id, seed, phase,
      |    CAST(8 + seed % 9 AS BIGINT) AS w,
      |    CAST(8 + seed % 7 AS BIGINT) AS h,
      |    4 + seed % 2 AS nf FROM g0),
      |fr AS (SELECT doc_id, seed, phase, w, h,
      |    unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS f FROM g),
      |px AS (SELECT doc_id, f, rr.r AS r, cc.c AS c,
      |    ('0x' || substr(md5(concat_ws('_', seed, f + phase,
      |      (rr.r*h)//8, (cc.c*w)//8)), 3, 2))::INT AS gray
      |  FROM fr,
      |    (SELECT unnest(generate_series(0, 7)) AS r) rr,
      |    (SELECT unnest(generate_series(0, 7)) AS c) cc),
      |bits AS (SELECT a.doc_id, a.f, a.r, a.c,
      |    CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.f = b.f
      |    AND a.r = b.r AND b.c = a.c + 1
      |  WHERE a.c <= 6),
      |hs AS (SELECT doc_id, f,
      |    CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(r*7 + c AS INT)))
      |      AS BIGINT) AS h
      |  FROM bits GROUP BY 1, 2),
      |al AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, oo.o AS o,
      |    count(*) AS matched
      |  FROM hs a
      |  CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS o) oo
      |  JOIN hs b ON b.doc_id > a.doc_id AND b.f = a.f + oo.o
      |    AND bit_count(xor(a.h, b.h)) <= 2
      |  GROUP BY 1, 2, 3
      |  HAVING count(*) >= 2)
      |SELECT id_a, id_b, CAST(o AS INT) AS offset, matched
      |FROM (SELECT id_a, id_b, o, matched, row_number() OVER (
      |    PARTITION BY id_a, id_b ORDER BY matched DESC, o ASC) AS rn
      |  FROM al)
      |WHERE rn = 1""".stripMargin

  /** The media-dedup DECISION step: q184's temporally aligned near-dup
    * pairs become an undirected graph; every clip maps to the min id
    * reachable through near-dup links ([[graft.operators.Dedup.clusters]]
    * min-label propagation), and exactly one representative per cluster
    * is kept. Same-seed clips at all three phases collapse into ONE
    * cluster (phase 0↔1 and 1↔2 overlap even where 0↔2 does not — the
    * transitive closure is doing real work). The oracle replays the
    * full chain: frame hashes → alignment pairs → recursive-CTE closure
    * → min label → keep verdict.
    *
    * Pairs derive from the per-fixture frame-hash CACHE
    * ([[MediaFixtures.aviFrameHashes97]], byte-identical to q184's
    * hashes) — this gate pins the CLUSTERING decision, so it should not
    * re-pay the decode a bench sweep already timed under q184.
    */
  def q189VideoClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = graft.multimodal.VideoHash.nearDuplicatesFromHashes(
        MediaFixtures.aviFrameHashes97(s, dir),
        maxDist = 2, maxOffset = 2, minMatch = 2)
      .select("id_a", "id_b")
    val labs = graft.operators.Dedup.clusters(pairs)
    labs.select(col("id").as("media_id"), col("cluster"),
        count(lit(1)).over(Window.partitionBy(col("cluster")))
          .as("cluster_size"),
        (col("id") === col("cluster")).cast("int").as("kept"))
  }

  /** q184's pair derivation + recursive transitive closure + keep rule. */
  val q189Sql: String = {
    val base = q184Sql
      .replace("WITH g0 AS", "WITH RECURSIVE g0 AS")
    val cut = base.indexOf("SELECT id_a, id_b, CAST(o AS INT) AS offset")
    require(cut > 0, "q184Sql shape changed; update q189Sql surgery")
    base.substring(0, cut) +
      """, p AS (SELECT DISTINCT id_a, id_b FROM al),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |          UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
        |SELECT id AS media_id, cluster,
        |  CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size,
        |  CAST(id = cluster AS INT) AS kept
        |FROM lab""".stripMargin
  }

  /** The END-TO-END media curation pipeline in one DAG — the q109 shape
    * for images: real pixel decode → channel-quality gate (green mean ≥
    * 127.5, an exact-integer-sum division both engines compute
    * identically) → perceptual near-dup clustering (q167 pairs →
    * min-label closure) → keep = passes quality AND is its cluster's
    * canonical. Every stage is an already-gated operator; the
    * COMPOSITION is what this gate pins, with both verdict bits live by
    * construction (md5 pixels put the mean astride 127.5; %83 clones
    * guarantee non-trivial clusters).
    */
  def q190MediaCuration(s: SparkSession, dir: String): DataFrame = {
    val media = MediaFixtures.bmpScramble83(s, dir)
    // the quality gate needs full-resolution pixels — that decode is this
    // gate's own operator; the near-dup pairs, though, come from the
    // per-fixture dHash cache (byte-identical to decoding again) so the
    // q167 decode isn't re-paid for the pair-mining stage
    val stats = graft.multimodal.Multimodal.pixelStats(media)
      .select(col("media_id"), col("width"), col("height"), col("g_mean"))
    val pairs = graft.multimodal.ImageHash.nearDuplicatesFromHashes(
        MediaFixtures.bmpDhash83(s, dir), maxDist = 2)
      .select("id_a", "id_b")
    val labs = graft.operators.Dedup.clusters(pairs)
      .select(col("id"), col("cluster"))
    val qPass = col("g_mean") >= 127.5
    stats.join(labs, stats("media_id") === labs("id"), "left")
      .select(col("media_id"), col("width"), col("height"), col("g_mean"),
        coalesce(col("cluster"), col("media_id")).as("canonical"),
        qPass.cast("int").as("q_pass"),
        (qPass && coalesce(col("cluster"), col("media_id")) === col("media_id"))
          .cast("int").as("kept"))
  }

  /** q167's hash CTEs → pairs → recursive closure, plus a full-resolution
    * green-channel mean replay, composed into the keep verdict. */
  val q190Sql: String = {
    val base = q167Sql.replace("WITH g0 AS", "WITH RECURSIVE g0 AS")
    val cut = base.indexOf("SELECT a.doc_id AS id_a")
    require(cut > 0, "q167Sql shape changed; update q190Sql surgery")
    base.substring(0, cut) +
      """, p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.h, b.h)) <= 2),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |          UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |fpx AS (SELECT doc_id, w, h,
        |    unnest(generate_series(0, CAST(h - 1 AS BIGINT))) AS r FROM g),
        |fpx2 AS (SELECT doc_id, w, h, r,
        |    unnest(generate_series(0, CAST(w - 1 AS BIGINT))) AS c FROM fpx),
        |gg AS (SELECT f2.doc_id, f2.w, f2.h,
        |    ('0x' || substr(md5(concat_ws('_', g0.seed, f2.r, f2.c)), 3, 2))::INT
        |      AS gv
        |  FROM fpx2 f2 JOIN g0 ON f2.doc_id = g0.doc_id),
        |means AS (SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |    CAST(sum(gv) AS BIGINT) * 1.0 / (w * h) AS g_mean
        |  FROM gg GROUP BY doc_id, w, h)
        |SELECT m.doc_id AS media_id, m.width, m.height, m.g_mean,
        |  coalesce(l.cluster, m.doc_id) AS canonical,
        |  CAST(m.g_mean >= 127.5 AS INT) AS q_pass,
        |  CAST(m.g_mean >= 127.5
        |    AND coalesce(l.cluster, m.doc_id) = m.doc_id AS INT) AS kept
        |FROM means m LEFT JOIN lab l ON l.id = m.doc_id""".stripMargin
  }

  /** Incremental media dedup at probe cost (the q93 index/probe posture
    * for images): 80% of the corpus is hashed ONCE into a persisted
    * (media_id, dhash) index; the daily batch (doc_id ≡ 0 mod 5) is then
    * the only side decoded — probe candidates come from distinct-hash
    * banding over the union hash set, index-internal pairs excluded. The
    * oracle is the brute-force ground truth restricted to batch-touching
    * pairs, so probe completeness is proven.
    */
  def q191MediaIndexProbe(s: SparkSession, dir: String): DataFrame = {
    val idxPath = s"/tmp/graft_q191_idx_${math.abs(dir.hashCode)}"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
    val media = MediaFixtures.bmpScramble83(s, dir)
    // index build: one decode+hash pass over the corpus side, persisted
    graft.multimodal.ImageHash.dhash(media.filter(col("media_id") % 5 =!= 0))
      .write.parquet(idxPath)
    // probe: only the batch is decoded; the index is read back value-sized
    graft.multimodal.ImageHash.probeNearDuplicates(
        media.filter(col("media_id") % 5 === 0),
        s.read.parquet(idxPath), maxDist = 2)
      .select("id_a", "id_b", "h_a", "h_b", "dist")
  }

  /** q167's ground truth restricted to pairs touching the probe batch. */
  val q191Sql: String =
    q167Sql.replace(
      "WHERE bit_count(xor(a.h, b.h)) <= 2",
      "WHERE bit_count(xor(a.h, b.h)) <= 2\n" +
        "  AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)")

  /** STREAMING incremental media dedup — q191's index/probe posture under
    * the q188 foreachBatch discipline, closing the text/media asymmetry:
    * media files ARRIVE as a file stream; each micro-batch decodes ONLY
    * itself, probes the persisted hash index, appends its verdicts to the
    * sink and its own hashes to the index (AFTER the probe materializes,
    * so the probe never sees its own batch on the index side). A pair
    * (a, b) with a arriving no later than b surfaces exactly once — in
    * b's micro-batch (same batch → the batch-batch path; earlier batch →
    * a's hash is already in the index) — so the sink's union is
    * BATCH-BOUNDARY-INDEPENDENT and the oracle is q191's ground truth.
    * Checkpointed AvailableNow (I1/I6 machinery), ≥ 2 micro-batches via
    * maxFilesPerTrigger.
    */
  def q193StreamingMediaDedup(s: SparkSession, dir: String): DataFrame = {
    val h = math.abs(dir.hashCode)
    val src = s"/tmp/graft_q193_src_$h"
    val idx = s"/tmp/graft_q193_idx_$h"
    val sink = s"/tmp/graft_q193_sink_$h"
    val ckpt = s"${graft.LocalScratch.dir()}/graft_q193_ckpt_$h"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    Seq(src, idx, sink, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val media = MediaFixtures.bmpScramble83(s, dir)
    // corpus index: ONE decode+hash pass, persisted before the stream
    graft.multimodal.ImageHash.dhash(media.filter(col("media_id") % 5 =!= 0))
      .write.parquet(idx)
    // the daily batch lands as 4 files → 2 micro-batches of 2
    media.filter(col("media_id") % 5 === 0).repartition(4)
      .write.parquet(src)
    import org.apache.spark.sql.types._
    val stream = graft.streaming.Incremental.fileStream(s, src,
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))),
      maxFilesPerTrigger = Some(2))
    graft.streaming.Incremental.runForeachBatchToParquet(stream, sink, ckpt,
      (batch, _) => {
        val sp = batch.sparkSession
        // foreachBatch side effects are at-least-once: a retried
        // micro-batch re-appends its hashes below, so the index read must
        // reconstruct the PRE-BATCH index exactly — dedup on media_id
        // (prior batches' duplicate appends are exact copies; index-sized,
        // not corpus) AND anti-join away the current batch's own ids (a
        // retry whose first attempt already appended would otherwise pair
        // each row against its batch-mates' index copies, duplicating
        // same-batch verdicts)
        val preBatchIndex = sp.read.parquet(idx)
          .dropDuplicates("media_id")
          .join(batch.select(col("media_id")), Seq("media_id"), "left_anti")
        val verdicts = graft.operators.Materialize.once(
          graft.multimodal.ImageHash.probeNearDuplicates(
              batch, preBatchIndex, maxDist = 2)
            .select("id_a", "id_b", "h_a", "h_b", "dist"))
        // grow the index only after the probe is materialized: the next
        // micro-batch sees this one's hashes, this one never self-joins
        graft.multimodal.ImageHash.dhash(batch)
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(idx)
        verdicts
      })
    s.read.parquet(sink)
  }

  /** Palette-PNG decode (the round-9 verdict's one remaining documented
    * decode quarantine, lifted): REAL indexed-color PNGs — PLTE + packed
    * 1/2/4/8-bit index scanlines + None/Sub/Up filters + zlib —
    * synthesized once per fixture ([[MediaFixtures.pngPalette7]]) and
    * decoded by [[graft.multimodal.PixelDecode]]'s own chunk walk /
    * inflater / de-filter / palette expansion. The oracle replays the
    * md5 formulas: per-channel exact sums (as IEEE means), plus the two
    * corner probes — a drift in bit unpacking order, filter stride,
    * palette lookup, or the de-filter math breaks the hash. (PngSpec
    * additionally cross-checks every pixel against the JDK's ImageIO
    * reader on the same payloads.)
    */
  def q194PalettePng(s: SparkSession, dir: String): DataFrame = {
    val media = MediaFixtures.pngPalette7(s, dir)
    graft.multimodal.Multimodal.pixelStats(media)
      .select(col("media_id"), col("width"), col("height"),
        col("r_mean"), col("g_mean"), col("b_mean"),
        col("top_left_r"), col("bottom_right_b"))
  }

  val q194Sql: String =
    """WITH g AS (SELECT doc_id,
      |    CAST(8 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(8 + doc_id % 3 AS BIGINT) AS h,
      |    CAST(power(2, doc_id % 4) AS INT) AS depth
      |  FROM documents WHERE doc_id % 7 = 0),
      |gg AS (SELECT doc_id, w, h, CAST(power(2, depth) AS INT) AS nc FROM g),
      |px AS (SELECT doc_id, w, h, nc, rr.r AS r, cc.c AS c FROM gg,
      |    (SELECT unnest(generate_series(0, 9)) AS r) rr,
      |    (SELECT unnest(generate_series(0, 11)) AS c) cc
      |  WHERE rr.r < h AND cc.c < w),
      |idx AS (SELECT doc_id, w, h, r, c,
      |    ('0x' || substr(md5(concat_ws('_', doc_id, r, c)), 1, 2))::INT % nc
      |      AS k
      |  FROM px),
      |pal AS (SELECT i.doc_id, i.w, i.h, i.r, i.c,
      |    ('0x' || substr(md5(concat_ws('_', i.doc_id, i.k, 0)), 3, 2))::INT AS rv,
      |    ('0x' || substr(md5(concat_ws('_', i.doc_id, i.k, 1)), 3, 2))::INT AS gv,
      |    ('0x' || substr(md5(concat_ws('_', i.doc_id, i.k, 2)), 3, 2))::INT AS bv
      |  FROM idx i)
      |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
      |  CAST(h AS INT) AS height,
      |  CAST(sum(rv) AS BIGINT) * 1.0 / (w * h) AS r_mean,
      |  CAST(sum(gv) AS BIGINT) * 1.0 / (w * h) AS g_mean,
      |  CAST(sum(bv) AS BIGINT) * 1.0 / (w * h) AS b_mean,
      |  CAST(max(CASE WHEN r = 0 AND c = 0 THEN rv END) AS INT) AS top_left_r,
      |  CAST(max(CASE WHEN r = h - 1 AND c = w - 1 THEN bv END) AS INT)
      |    AS bottom_right_b
      |FROM pal GROUP BY doc_id, w, h""".stripMargin

  /** Adam7-interlaced PNG decode (the OTHER PNG layout, lifted in the
    * same round as palette support): identical palette/pixel formulas to
    * q194 — the oracle replay is q194's verbatim, on every 11th document
    * — but the payloads pack the seven Adam7 sub-images, each pass
    * independently filtered. The engine must reconstruct the exact same
    * full-frame pixels through pass-geometry math + per-pass de-filter +
    * scatter; a transposed stride, mis-ordered pass, or cross-pass filter
    * reference breaks the hash while q194 (sequential layout, same
    * formulas) stays green — isolating interlace bugs from palette bugs.
    * (PngSpec cross-checks the same payloads pixel-for-pixel against the
    * JDK ImageIO reader.)
    */
  def q195InterlacedPng(s: SparkSession, dir: String): DataFrame = {
    val media = MediaFixtures.pngAdam7_11(s, dir)
    graft.multimodal.Multimodal.pixelStats(media)
      .select(col("media_id"), col("width"), col("height"),
        col("r_mean"), col("g_mean"), col("b_mean"),
        col("top_left_r"), col("bottom_right_b"))
  }

  val q195Sql: String =
    q194Sql.replace("FROM documents WHERE doc_id % 7 = 0",
      "FROM documents WHERE doc_id % 11 = 0")

  /** 16-bit-depth PNG decode (the last PNG quarantine, lifted in round
    * 10): truecolor payloads whose samples are big-endian byte PAIRS —
    * the filter stride becomes 6 bytes/pixel and Sub/Up references
    * straddle sample halves, which is exactly what an 8-bit-only
    * de-filter walk gets wrong. The oracle replays the md5 sample
    * formulas at full 16-bit range (means up to 65535 prove the decoder
    * kept precision instead of truncating to the low or high byte).
    * (PngSpec cross-checks the same payloads sample-for-sample against
    * the JDK ImageIO reader's 16-bit raster.)
    */
  def q200Png16(s: SparkSession, dir: String): DataFrame = {
    val media = MediaFixtures.png16_23(s, dir)
    graft.multimodal.Multimodal.pixelStats(media)
      .select(col("media_id"), col("width"), col("height"),
        col("r_mean"), col("g_mean"), col("b_mean"),
        col("top_left_r"), col("bottom_right_b"))
  }

  val q200Sql: String =
    """WITH g AS (SELECT doc_id,
      |    CAST(8 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(8 + doc_id % 3 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 23 = 0),
      |px AS (SELECT doc_id, w, h, rr.r AS r, cc.c AS c FROM g,
      |    (SELECT unnest(generate_series(0, 9)) AS r) rr,
      |    (SELECT unnest(generate_series(0, 11)) AS c) cc
      |  WHERE rr.r < h AND cc.c < w),
      |sm AS (SELECT doc_id, w, h, r, c,
      |    ('0x' || substr(md5(concat_ws('_', doc_id, r, c, 0)), 1, 4))::INT AS rv,
      |    ('0x' || substr(md5(concat_ws('_', doc_id, r, c, 1)), 1, 4))::INT AS gv,
      |    ('0x' || substr(md5(concat_ws('_', doc_id, r, c, 2)), 1, 4))::INT AS bv
      |  FROM px)
      |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
      |  CAST(h AS INT) AS height,
      |  CAST(sum(rv) AS BIGINT) * 1.0 / (w * h) AS r_mean,
      |  CAST(sum(gv) AS BIGINT) * 1.0 / (w * h) AS g_mean,
      |  CAST(sum(bv) AS BIGINT) * 1.0 / (w * h) AS b_mean,
      |  CAST(max(CASE WHEN r = 0 AND c = 0 THEN rv END) AS INT) AS top_left_r,
      |  CAST(max(CASE WHEN r = h - 1 AND c = w - 1 THEN bv END) AS INT)
      |    AS bottom_right_b
      |FROM sm GROUP BY doc_id, w, h""".stripMargin

  /** RLE8 BMP decode (BI_RLE8 — the compressed BMP quarantine, lifted):
    * real run-length palette bitmaps whose pixel/palette formulas replay
    * in SQL. The fixture's column split keeps BOTH RLE encodings live —
    * columns < 4 derive from c/2 (adjacent pairs equal → encoded runs),
    * the rest from per-cell hashes (singleton stretches → absolute
    * segments with word padding) — and every scanline exercises the EOL
    * escape bottom-up. A broken run length, absolute pad, palette
    * B,G,R order, or row flip breaks the channel means / corner probes.
    * (PixelDecodeSpec cross-checks the payloads pixel-for-pixel against
    * the JDK ImageIO BMP reader.)
    */
  def q197RleBmp(s: SparkSession, dir: String): DataFrame = {
    val media = MediaFixtures.bmpRle8_13(s, dir)
    graft.multimodal.Multimodal.pixelStats(media)
      .select(col("media_id"), col("width"), col("height"),
        col("r_mean"), col("g_mean"), col("b_mean"),
        col("top_left_r"), col("bottom_right_b"))
  }

  val q197Sql: String =
    """WITH g AS (SELECT doc_id,
      |    CAST(8 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(8 + doc_id % 3 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 13 = 0),
      |px AS (SELECT doc_id, w, h, rr.r AS r, cc.c AS c FROM g,
      |    (SELECT unnest(generate_series(0, 9)) AS r) rr,
      |    (SELECT unnest(generate_series(0, 11)) AS c) cc
      |  WHERE rr.r < h AND cc.c < w),
      |idx AS (SELECT doc_id, w, h, r, c,
      |    CASE WHEN c < 4 THEN
      |      ('0x' || substr(md5(concat_ws('_', doc_id, r, c // 2)), 1, 2))::INT % 16
      |    ELSE
      |      ('0x' || substr(md5(concat_ws('_', doc_id, r, c, 's')), 1, 2))::INT % 16
      |    END AS k
      |  FROM px),
      |pal AS (SELECT i.doc_id, i.w, i.h, i.r, i.c,
      |    ('0x' || substr(md5(concat_ws('_', i.doc_id, i.k, 0)), 3, 2))::INT AS rv,
      |    ('0x' || substr(md5(concat_ws('_', i.doc_id, i.k, 1)), 3, 2))::INT AS gv,
      |    ('0x' || substr(md5(concat_ws('_', i.doc_id, i.k, 2)), 3, 2))::INT AS bv
      |  FROM idx i)
      |SELECT doc_id AS media_id, CAST(w AS INT) AS width,
      |  CAST(h AS INT) AS height,
      |  CAST(sum(rv) AS BIGINT) * 1.0 / (w * h) AS r_mean,
      |  CAST(sum(gv) AS BIGINT) * 1.0 / (w * h) AS g_mean,
      |  CAST(sum(bv) AS BIGINT) * 1.0 / (w * h) AS b_mean,
      |  CAST(max(CASE WHEN r = 0 AND c = 0 THEN rv END) AS INT) AS top_left_r,
      |  CAST(max(CASE WHEN r = h - 1 AND c = w - 1 THEN bv END) AS INT)
      |    AS bottom_right_b
      |FROM pal GROUP BY doc_id, w, h""".stripMargin

  /** RLE4 BMP decode — BI_RLE8's nibble sibling, completing the BMP RLE
    * family: encoded runs alternate the opcode byte's two nibbles,
    * absolute segments pack indices two per byte MSB-first with word
    * padding. The fixture carries q197's exact pixel/palette formulas on
    * the %17 document slice, so the oracle is q197's replay verbatim — a
    * nibble-order, alternation, or padding bug breaks q198 while q197
    * stays green, isolating the 4-bit packing from the RLE walk.
    */
  def q198Rle4Bmp(s: SparkSession, dir: String): DataFrame = {
    val media = MediaFixtures.bmpRle4_17(s, dir)
    graft.multimodal.Multimodal.pixelStats(media)
      .select(col("media_id"), col("width"), col("height"),
        col("r_mean"), col("g_mean"), col("b_mean"),
        col("top_left_r"), col("bottom_right_b"))
  }

  val q198Sql: String =
    q197Sql.replace("FROM documents WHERE doc_id % 13 = 0",
      "FROM documents WHERE doc_id % 17 = 0")

  val queries: Map[String, Q] = Map(
    "q198_rle4_bmp" -> (q198Rle4Bmp _),
    "q197_rle_bmp" -> (q197RleBmp _),
    "q195_interlaced_png" -> (q195InterlacedPng _),
    "q200_png16" -> (q200Png16 _),
    "q194_palette_png" -> (q194PalettePng _),
    "q193_streaming_media_dedup" -> (q193StreamingMediaDedup _),
    "q191_media_index_probe" -> (q191MediaIndexProbe _),
    "q190_media_curation" -> (q190MediaCuration _),
    "q189_video_clusters" -> (q189VideoClusters _),
    "q167_image_dhash" -> (q167ImageDhash _),
    "q168_audio_fingerprint" -> (q168AudioFingerprint _),
    "q184_video_neardup" -> (q184VideoNearDup _))

  val oracleSql: Map[String, String] = Map(
    "q198_rle4_bmp" -> q198Sql,
    "q197_rle_bmp" -> q197Sql,
    "q195_interlaced_png" -> q195Sql,
    "q200_png16" -> q200Sql,
    "q194_palette_png" -> q194Sql,
    "q193_streaming_media_dedup" -> q191Sql, // boundary-independent: q191's ground truth
    "q191_media_index_probe" -> q191Sql,
    "q190_media_curation" -> q190Sql,
    "q189_video_clusters" -> q189Sql,
    "q167_image_dhash" -> q167Sql,
    "q168_audio_fingerprint" -> q168Sql,
    "q184_video_neardup" -> q184Sql)
}
