package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-batch schema reconciliation: widening lattice, null-fill for
  * late columns, refusal of lossy changes, batch provenance.
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_sespec_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  test("widen lattice: lossless promotions only") {
    assert(SchemaEvolution.widen(IntegerType, LongType) === LongType)
    assert(SchemaEvolution.widen(LongType, IntegerType) === LongType)
    assert(SchemaEvolution.widen(FloatType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widen(IntegerType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widen(StringType, StringType) === StringType)
    intercept[IllegalArgumentException] {
      SchemaEvolution.widen(StringType, LongType) // not additive
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.widen(LongType, FloatType) // lossy: 2^53+1
    }
  }

  test("readAll: widened types, null-filled late columns, provenance") {
    val root = freshRoot("evolve")
    SchemaEvolution.writeBatch(
      Seq((1, 10), (2, 20)).toDF("k", "x"), root, "t", batch = 0)
    SchemaEvolution.writeBatch(
      Seq((3L, 30L, "a"), (4L, 40L, "b")).toDF("k", "x", "tag"),
      root, "t", batch = 1)
    val got = SchemaEvolution.readAll(spark, root, "t")
    val sch = got.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("k") === LongType && sch("x") === LongType)
    assert(sch("tag") === StringType && sch("_batch") === IntegerType)
    val rows = got.select("k", "x", "tag", "_batch")
      .as[(Long, Long, Option[String], Int)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, 10L, None, 0), (2L, 20L, None, 0),
      (3L, 30L, Some("a"), 1), (4L, 40L, Some("b"), 1)))
  }

  test("column order follows first appearance; three-way widen chains") {
    val root = freshRoot("chain")
    SchemaEvolution.writeBatch(Seq((1.toShort, 1.0f)).toDF("a", "b"), root, "t", 0)
    SchemaEvolution.writeBatch(Seq((2, 2.0)).toDF("a", "b"), root, "t", 1)
    SchemaEvolution.writeBatch(Seq((3L, 3.0)).toDF("a", "b"), root, "t", 2)
    val got = SchemaEvolution.readAll(spark, root, "t")
    assert(got.columns.toSeq === Seq("a", "b", "_batch"))
    assert(got.schema("a").dataType === LongType)
    assert(got.schema("b").dataType === DoubleType)
    assert(got.agg(sum("a"), sum("b")).as[(Long, Double)].head() === ((6L, 6.0)))
  }

  test("conflicting non-additive batches fail loudly, not silently") {
    val root = freshRoot("conflict")
    SchemaEvolution.writeBatch(Seq((1, "x")).toDF("k", "v"), root, "t", 0)
    SchemaEvolution.writeBatch(Seq((2, 9L)).toDF("k", "v"), root, "t", 1)
    intercept[IllegalArgumentException] {
      SchemaEvolution.readAll(spark, root, "t")
    }
  }
}
