package graft.expressions

import graft.SparkTestBase

class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registered SQL functions evaluate the native kernels") {
    GraftFunctions.registerAll(spark)
    Seq((Array(1.0f, 0.0f), Array(0.6f, 0.8f))).toDF("a", "b")
      .createOrReplaceTempView("v_vecs")
    val r = spark.sql(
      "SELECT cosine_sim(a, b) AS c, dot_product(a, b) AS d FROM v_vecs")
      .collect().head
    assert(math.abs(r.getDouble(0) - 0.6) < 1e-6)
    assert(math.abs(r.getDouble(1) - 0.6) < 1e-6)
  }

  test("SQL function type errors are caught at analysis") {
    GraftFunctions.registerAll(spark)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("v_ints")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(a, b) FROM v_ints").collect()
    }
    assert(ex.getMessage.contains("array<float>"))
  }
}
