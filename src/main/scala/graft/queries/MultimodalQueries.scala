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
    // and cross-copy images disjoint
    val seed = col("doc_id") % 83 + (col("doc_id") / 100000000L).cast("long") * 83
    val w = (lit(8) + seed % 9).cast("int")
    val h = (lit(8) + seed % 7).cast("int")
    // spread BEFORE the Column-byte-math synthesis: a single-file fixture
    // plans one input split and would serialize the encode onto one core
    val media = graft.operators.Parallelism.spread(Tables.documents(s, dir))
      .select(col("doc_id").as("media_id"),
        graft.multimodal.Multimodal.syntheticBmpScramble(seed, w, h).as("payload"))
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
      |    (seed*31 + ((rr.r*h)//8)*((rr.r*h)//8)*7
      |      + ((cc.c*w)//8)*((cc.c*w)//8)*5
      |      + ((rr.r*h)//8)*((cc.c*w)//8)*3 + 11) % 256 AS gray
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
    // copy-distinct seeds — same rationale as q167
    val seed = col("doc_id") % 89 + (col("doc_id") / 100000000L).cast("long") * 89
    val media = graft.operators.Parallelism.spread(Tables.documents(s, dir))
      .select(col("doc_id").as("media_id"),
        graft.multimodal.Multimodal.syntheticWavScramble(seed, lit(1024))
          .as("payload"))
    graft.multimodal.AudioHash.nearDuplicates(media, maxDist = 2)
      .select("id_a", "id_b", "h_a", "h_b", "dist")
  }

  val q168Sql: String =
    """WITH sam AS (SELECT seed, i,
      |    ((seed*37 + (i+seed)*(i+seed)*13 + i*29) % 2048) - 1024 AS s
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

  val queries: Map[String, Q] = Map(
    "q167_image_dhash" -> (q167ImageDhash _),
    "q168_audio_fingerprint" -> (q168AudioFingerprint _))

  val oracleSql: Map[String, String] = Map(
    "q167_image_dhash" -> q167Sql,
    "q168_audio_fingerprint" -> q168Sql)
}
