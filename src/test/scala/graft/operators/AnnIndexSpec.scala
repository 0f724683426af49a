package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted ANN index: the stored build/probe path must return exactly
  * what the in-memory IVF path returns on the same corpus/centroids —
  * persistence must not change a single neighbor or score.
  */
class AnnIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("append-maintained index ≡ full rebuild (probe-identical)") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val cents = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val corpus = emb.filter(col("vec_id") % 100 =!= 0)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

    val full = "/tmp/graft_annindex_spec_full"
    val inc = "/tmp/graft_annindex_spec_inc"
    Seq(full, inc).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    AnnIndex.build(corpus, cents, full)
    // incremental: 80% built, 20% appended in two separate daily batches
    AnnIndex.build(corpus.filter(col("vec_id") % 5 =!= 4), cents, inc)
    AnnIndex.append(
      corpus.filter(col("vec_id") % 5 === 4 && col("vec_id") % 2 === 0), inc)
    AnnIndex.append(
      corpus.filter(col("vec_id") % 5 === 4 && col("vec_id") % 2 =!= 0), inc)

    def probeSet(root: String) =
      AnnIndex.probe(spark, root, queries, k = 5, nprobe = 3)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = probeSet(full)
    val b = probeSet(inc)
    assert(a.nonEmpty && a === b)
  }

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

  test("q110 index key is a content fingerprint: a changed corpus under the SAME path rebuilds") {
    // the round-5 path-keyed root served a stale index when the corpus
    // changed under an unchanged path within one long-lived session
    val dir = "/tmp/graft_annindex_fp_corpus"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val emb = graft.queries.Tables.embeddings(spark, sf)
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val r1 = graft.queries.PipelineQueries.q110AnnIndexProbe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(r1.nonEmpty)

    // mutate the corpus in place: shift every corpus vector id by 1000
    // (queries/centroid slices land on different vec_ids → different
    // neighbors), same path
    val mutated = emb.withColumn("vec_id", col("vec_id") + lit(1000L))
    val tmp = s"$dir/embeddings_next.parquet"
    mutated.write.mode("overwrite").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet"))

    val r2 = graft.queries.PipelineQueries.q110AnnIndexProbe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(r2.nonEmpty)
    // every id in the mutated corpus is shifted — a stale index would
    // return the OLD neighbor ids for the new queries (or nothing at all)
    assert(r2.map(_._2).forall(_ >= 1000L),
      "probe returned neighbor ids from the stale pre-mutation index")
    assert(r1 !== r2)
  }
}
