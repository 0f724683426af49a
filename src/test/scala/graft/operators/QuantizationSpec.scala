package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero vector
    (2L, Array(-2.0f, 2.0f, 1.0f, -1.0f)))
    .toDF("vec_id", "embedding")

  test("codes stay in [-127,127]; max-abs element maps to ±127; zero vector is safe") {
    val out = vecs.select($"vec_id", Quantization.quantize($"embedding").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out.values.flatten.forall(q => q >= -127 && q <= 127))
    assert(out(0L) === Seq(127, -64, 32, 0))
    assert(out(1L) === Seq(0, 0, 0, 0))
    assert(out(2L) === Seq(-127, 127, 64, -64))
  }

  test("reconstruction RMSE is bounded by half a quantization step") {
    val rows = vecs.select($"vec_id", Quantization.maxAbsScale($"embedding").as("s"),
        Quantization.rmse($"embedding").as("e"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (id, s, e) =>
      assert(e <= s / 127.0 / 2.0 + 1e-12, s"vec $id: rmse $e vs step ${s / 127.0}")
    }
    assert(rows.find(_._1 == 1L).get._3 === 0.0) // zero vector reconstructs exactly
  }
}
