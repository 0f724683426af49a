package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "spark sql window functions shuffle partition join"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "completely different tokens entirely unrelated words here"))
    .toDF("doc_id", "text")

  test("exact dedup keeps smallest id per content group") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val kept = out.filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 5L)) // 4 is the dup
  }

  test("shingles are distinct k-grams; short docs fall back to whole text") {
    val sh = docs.select(Dedup.shingles($"text", 3).as("s"))
      .filter($"s".isNotNull).first().getSeq[String](0)
    assert(sh.contains("the quick brown"))
    val short = Seq((9L, "tiny doc")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 3).as("s")).first().getSeq[String](0)
    assert(short === Seq("tiny doc"))
  }

  test("mid-similarity adversarial fixture: banding sized to the threshold keeps LSH == exact") {
    // 30 document pairs engineered at exactly J = 0.5 (14 shared + 6 own
    // tokens → 12 shared of 18 shingles each → 12/24) — the profile q27's
    // 8-band×4-row choice does NOT cover (its J⁴ collision curve misses a
    // J=0.5 pair with ~60% probability; that choice is valid only on the
    // gated corpus, where measured pair similarity is bimodal: ~0.02
    // background vs ≥0.88 true pairs). Banding re-sized for the threshold
    // (32 bands × 1 row: miss probability (1−J)^32 ≈ 2e-10) must make the
    // banded result EQUAL the exact all-pairs join here — the assertion
    // that pins how to parameterize on a non-bimodal corpus.
    val mid = (0 until 30).flatMap { p =>
      val shared = (0 until 14).map(i => s"w${p}_$i")
      val a = (shared ++ (0 until 6).map(i => s"a${p}_$i")).mkString(" ")
      val b = (shared ++ (0 until 6).map(i => s"b${p}_$i")).mkString(" ")
      Seq((2L * p, a), (2L * p + 1, b))
    }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairs(Dedup.allPairsJaccard(mid, "text", "doc_id", 0.3))
    assert(exact.size === 30) // every engineered pair, nothing else
    val lsh = pairs(Dedup.nearDuplicates(mid, "text", "doc_id",
      threshold = 0.3, numHashes = 32, bands = 32))
    assert(lsh === exact)
  }

  test("clusters: chain graph converges over many rounds with FLAT lineage") {
    // a 13-node chain forces ~12 propagation rounds (the min label travels
    // one hop per round) — the shape where a growing plan lineage would
    // blow up replanning at scale. Each round is an eager localCheckpoint,
    // so the returned plan must be a LEAF (LogicalRDD), not 12 nested join
    // layers.
    val chain = (0 until 12).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(chain)
    assert(out.queryExecution.optimizedPlan.getClass.getSimpleName === "LogicalRDD")
    val labels = out.as[(Long, Long)].collect().toMap
    assert(labels.size === 13 && labels.values.forall(_ === 0L))
  }

  test("clustersByContraction: a 1000-node path converges in O(log diameter) rounds") {
    // the exact case min-label propagation cannot finish (999 rounds);
    // alternating large-star/small-star must halve the diameter per round
    val chain = (0 until 999).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.contractionLabels(chain)
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size === 1000 && m.values.forall(_ === 0L), "one component, min label 0")
    assert(rounds <= 15, s"999-hop path must contract in ~log2 rounds, took $rounds")
  }

  test("clustersByContraction: mixed components get their min-id labels") {
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), // path
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (30L, 31L),                         // pair
      (41L, 40L)                          // reversed pair
    ).toDF("id_a", "id_b")
    val m = Dedup.clustersByContraction(edges)
      .as[(Long, Long)].collect().toMap
    assert(m === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L,
      40L -> 40L, 41L -> 40L))
  }

  test("clustersByContraction: a 10^4-degree hub converges in O(1) rounds (skew shape)") {
    // one hub (0) with 10,000 spokes plus a 50-hop chain hanging off it —
    // the hot-key case the large-star step exists for. Degree must not
    // buy rounds: the star flattens in a constant number of alternations,
    // the fixed chain adds its own log-diameter, so the TOTAL stays small
    // regardless of hub size.
    val h = 10000L
    val star = (1L to h).map(i => (0L, i)).toDF("id_a", "id_b")
    val chain = ((0L until 50L).map(i => (h + 1 + i, h + 2 + i)) :+ (0L, h + 1L))
      .toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.contractionLabels(star.unionByName(chain))
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size === (h + 52).toInt && m.values.forall(_ === 0L),
      "one component rooted at the hub")
    assert(rounds <= 10, s"hub degree must not inflate rounds, took $rounds")
  }

  test("contraction parity: endpoints appearing ONLY as a self-pair keep their own label") {
    // a self-pair (x, x) survives no lo =!= hi edge filter, so the star
    // labels alone would drop x from the output — the r11 fallback
    // re-attaches every pair endpoint with label = own id. Must match
    // clusters() exactly (isolated node labels itself).
    val edges = Seq(
      (5L, 5L),           // self-pair-only endpoint: no real edge
      (10L, 11L),         // ordinary pair
      (12L, 12L), (12L, 13L) // self-pair PLUS a real edge: label via edge
    ).toDF("id_a", "id_b")
    val viaContraction = Dedup.clustersByContraction(edges)
      .as[(Long, Long)].collect().toMap
    val viaPropagation = Dedup.clusters(edges)
      .as[(Long, Long)].collect().toMap
    val expected = Map(5L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 12L, 13L -> 12L)
    assert(viaContraction === expected)
    assert(viaPropagation === expected)

    // the ONLY-self-pairs degenerate graph: zero real edges, zero rounds,
    // every endpoint still labeled
    val selfOnly = Seq((7L, 7L), (9L, 9L)).toDF("id_a", "id_b")
    assert(Dedup.clustersByContraction(selfOnly)
      .as[(Long, Long)].collect().toMap === Map(7L -> 7L, 9L -> 9L))

    // maxIter > SwitchRounds supersession: clusters(maxIter=50) on a
    // chain longer than SwitchRounds hands off to contraction — the
    // self-pair endpoint must survive the handoff too
    val chainPlusSelf = ((100 until 120).map(i => (i.toLong, i + 1L)) :+
      (200L, 200L)).toDF("id_a", "id_b")
    val m = Dedup.clusters(chainPlusSelf, maxIter = 50)
      .as[(Long, Long)].collect().toMap
    assert(m(200L) === 200L && m.size === 22 &&
      (100 to 120).forall(i => m(i.toLong) === 100L))
  }

  test("clusters() hands long chains to contraction and matches propagation labels") {
    // 60-hop path: over SwitchRounds (8) and under the old 50-round warn —
    // the auto-switch must return the same labels propagation would
    val chain = (100 until 160).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val m = Dedup.clusters(chain).as[(Long, Long)].collect().toMap
    assert(m.size === 61 && m.values.forall(_ === 100L))
  }

  test("minhash-LSH near-duplicates finds exact and near pairs, skips unrelated") {
    val nd = Dedup.nearDuplicates(docs, "text", "doc_id",
      threshold = 0.5, numHashes = 32, bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 4L))) // identical
    assert(nd.contains((1L, 2L)) || nd.contains((2L, 4L))) // near-dup
    assert(!nd.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("LSH candidates verified by exact jaccard: identical docs give 1.0") {
    val pairs = Dedup.hashedShinglePairs(docs, "text", "doc_id", 3)
    val cand = Seq((1L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardVerify(cand, pairs).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 4L)) === 1.0)
    assert(!j.contains((1L, 3L))) // no shared shingles -> no row
  }

  test("simhash: identical docs equal; unrelated docs distant") {
    val fp = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(4L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(5L)) > 10)
    // near-dup docs are closer than unrelated docs
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(2L)) <
      java.lang.Long.bitCount(fp(1L) ^ fp(5L)))
  }

  test("banded simhash near-dup finds identical pairs without cross join") {
    val nd = Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxDistance = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 4L)))
  }

  test("32-bit portable simhash: fingerprints fit the width; identical docs pair") {
    val fp = Dedup.simhash(docs, "text", "doc_id",
        tokenHash = graft.text.TextFunctions.portableTokenHash, bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.values.forall(v => v >= 0 && v < (1L << 32)))
    assert(fp(1L) === fp(4L))
    val nd = Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxDistance = 1,
        tokenHash = graft.text.TextFunctions.portableTokenHash, bits = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 4L)))
  }

  test("embedding near-dup: LSH variant ⊆ exact, with usable recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingNearDuplicates(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDuplicatesLsh(emb, 0.4, bits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // verify step guarantees precision 1.0
    assert(exact.nonEmpty)
    assert(lsh.size.toDouble / exact.size >= 0.5, s"recall ${lsh.size}/${exact.size}")
  }

  test("incremental probe == full near-dup restricted to new-side pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val existing = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val index = Dedup.bandIndex(existing, "text", "doc_id", 32, 16, 3)
    val inc = Dedup.probeIndex(batch, index, existing, "text", "doc_id",
        threshold = 0.2, numHashes = 32, bands = 16, shingleSize = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.nearDuplicates(docs, "text", "doc_id",
        threshold = 0.2, numHashes = 32, bands = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("q52 gates the bucketed LSH plan: equi-join on (table, bucket), no n² product") {
    val df = graft.queries.TextQueries.q52EmbeddingDedup(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q52 LSH gate: portable-plane output ⊆ exact pairs with usable recall") {
    val dir = "/root/testdata/sf0.001"
    val gated = graft.queries.TextQueries.q52EmbeddingDedup(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingNearDuplicates(
        spark.read.parquet(s"$dir/embeddings.parquet"), 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(gated.subsetOf(exact))
    assert(exact.nonEmpty)
    assert(gated.size.toDouble / exact.size >= 0.5, s"recall ${gated.size}/${exact.size}")
  }

  test("LSH candidate pairs are a superset of high-jaccard truth on fixtures") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val truth = graft.queries.TextQueries.q26NgramJaccard(spark, "/root/testdata/sf0.001")
      .filter($"jaccard" >= 0.9).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.nearDuplicates(fixture, "text", "doc_id",
      threshold = 0.9, numHashes = 32, bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 16 bands of 2 hashes: P(candidate) at j=0.9 is 1-(1-0.81)^16 ≈ 1-3e-12
    assert(truth.subsetOf(lsh))
  }
}
