package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe.
  *
  * `udf(bf.mightContain _)` puts a ScalaUDF in the pre-shuffle hot map and
  * breaks whole-stage codegen exactly where row throughput matters most.
  * Spark's own runtime row-level filtering has a native, codegen'd
  * expression for this — `BloomFilterMightContain` — but no public Column
  * API. This wraps it over a driver-built
  * `org.apache.spark.util.sketch.BloomFilter` (`df.stat.bloomFilter`):
  * the sketch serializes into a binary literal and each task deserializes
  * it once; `mightContainLong` here ≡ `mightContain` in the UDF (the
  * sketch applies its own internal hashing to the raw key in both).
  */
object BloomProbe {

  /** `key` must be integral (probed as long). FP-only: combine with an
    * exact semi-join downstream, as q59 does.
    */
  def mightContain(bf: BloomFilter, key: Column): Column = {
    val os = new java.io.ByteArrayOutputStream()
    bf.writeTo(os)
    org.apache.spark.sql.graft.bridge.column(
      BloomFilterMightContain(
        Literal(os.toByteArray, BinaryType),
        org.apache.spark.sql.graft.bridge.expression(key)))
  }
}
