package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f))) // opposite to 0
    .toDF("vec_id", "embedding")

  test("cosine: parallel=1, orthogonal=0, opposite=-1") {
    val out = vecs.crossJoin(vecs.select($"vec_id".as("b_id"), $"embedding".as("b")))
      .filter($"vec_id" === 0)
      .select($"b_id", Similarity.cosine($"embedding", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(0L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 3)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
  }

  test("LSH top-k achieves high recall vs brute force on the fixture corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, k = 5, bits = 6, dims = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("portablePlanes: coefficients in [-1,1), deterministic, table-distinct") {
    val p0 = Similarity.portablePlanes(6, 64, table = 0)
    val p1 = Similarity.portablePlanes(6, 64, table = 1)
    assert(p0.flatten.forall(c => c >= -1.0 && c < 1.0))
    assert(p0.flatten.toSeq === Similarity.portablePlanes(6, 64, 0).flatten.toSeq)
    assert(p0.flatten.toSeq !== p1.flatten.toSeq)
    // exact reconstruction from the integer formula (the oracle's contract)
    val c00 = (((0L * 100003L + 0L * 64 + 0 + 1) * 2654435761L) % 4294967296L) / 2147483648.0 - 1.0
    assert(p0(0)(0) === c00)
  }

  test("portable-plane LSH top-k achieves usable recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, k = 5, bits = 6, dims = 64,
        planesFor = Some(t => Similarity.portablePlanes(6, 64, t)))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"portable-plane LSH recall $recall too low")
  }

  test("IVF with trained centroids achieves high recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 5, nlist = 8, nprobe = 3, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("IVF probing every cell reproduces brute force exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val full = Similarity.ivfTopK(emb, queries, k = 5, nlist = 4, nprobe = 4, iters = 1)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(full === exact)
  }

  test("ivfCentroids produces at most nlist cells and dimension-correct centroids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroids(emb, nlist = 8, iters = 2).collect()
    assert(cents.length <= 8 && cents.nonEmpty)
    assert(cents.forall(_.getAs[Seq[Double]]("centroid").length === 64))
    val cells = Similarity.assignCells(emb,
      Similarity.ivfCentroids(emb, nlist = 8, iters = 2))
    assert(cells.count() === emb.count())
    assert(cells.select("cell").distinct().count() <= 8)
  }

  test("lshSignature fails loudly on wrong embedding dimension") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding") // dims=2, not 64
    val ex = intercept[Exception] {
      bad.select(Similarity.lshSignature($"embedding", 8, 64)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("embedding length")), msgs(ex).mkString("; "))
  }

  test("lshSignature buckets are deterministic across invocations") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val s1 = emb.select($"vec_id", Similarity.lshSignature($"embedding", 8, 64).as("b"))
      .as[(Long, Long)].collect().toMap
    val s2 = emb.select($"vec_id", Similarity.lshSignature($"embedding", 8, 64).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(s1 === s2)
  }
}
