package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted ANN index: the stored build/probe path must return exactly
  * what the in-memory IVF path returns on the same corpus/centroids —
  * persistence must not change a single neighbor or score.
  */
class AnnIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("stored-index probe ≡ in-memory ivfTopK; broadcast probe join") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val corpus = emb.filter(col("vec_id") % 100 =!= 0)
    val queries = emb.filter(col("vec_id") % 100 === 0)

    val root = "/tmp/graft_annindex_spec"
    AnnIndex.build(corpus, cents, root)
    val stored = AnnIndex.probe(spark, root, queries, k = 5, nprobe = 3)
    val inMem = Similarity.ivfTopK(corpus, queries, k = 5, nprobe = 3,
      centroids = Some(cents))

    val a = stored.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = inMem.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.nonEmpty)

    // the candidate join (inverted index × probed cells) must be a
    // broadcast HASH join on the cell key; the query→centroid routing
    // crossJoin is legitimately nested-loop over the nlist-row broadcast
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [cell"), plan)
  }
}
