package graft.expressions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.6f, 0.8f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f)),   // zero norm
    (3L, Array(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("matches hand-computed cosines; zero norm yields null") {
    val out = vecs
      .withColumn("c", CosineSimilarity($"embedding", array(lit(1.0f), lit(0.0f), lit(0.0f))))
      .orderBy("vec_id").collect()
    val ci = out.head.fieldIndex("c")
    assert(math.abs(out(0).getDouble(ci) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(ci) - 0.6) < 1e-6) // 0.6f carries float error
    assert(out(2).isNullAt(ci))
    assert(math.abs(out(3).getDouble(ci) + 1.0) < 1e-12)
  }

  test("bit-identical to the higher-order-function fold form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_vec"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        CosineSimilarity($"embedding", $"q_vec").as("native"),
        Similarity.cosine($"embedding", $"q_vec").as("fold"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mismatched lengths and null inputs yield null") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    assert(df.select(CosineSimilarity($"a", $"b")).collect().head.isNullAt(0))
    val dfn = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(dfn.select(CosineSimilarity($"a", $"b")).collect().head.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.limit(1).select($"embedding".as("q_vec"))
    val df = emb.crossJoin(broadcast(q))
      .select(CosineSimilarity($"embedding", $"q_vec").as("c"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen stage in simpleString;
    // the projection carrying cosinesimilarity must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("cosinesimilarity") && l.trim.matches(".*\\*\\(\\d+\\) Project.*")), plan)
  }
}
