package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val keys = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(graft.text.TextFunctions.tokens($"text")).as("k"))
    .filter(length($"k") > 0)

  test("estimates are exact-or-over for every key, and exact for heavy hitters") {
    val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))
    val cms = Sketches.cmsBuild(keys, "k", width = 512, depth = 4)
    val est = Sketches.cmsEstimate(cms, exact.select($"k"), "k", width = 512, depth = 4)
    val joined = est.join(exact, "k")
      .select($"k", $"n", $"cms_estimate").collect()
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"underestimate for ${r.getString(0)}")
    }
    // with width 512 over a small vocab, most estimates should be exact
    val exactHits = joined.count(r => r.getLong(2) == r.getLong(1))
    assert(exactHits.toDouble / joined.length > 0.5)
  }

  test("sketches merge by counter addition: shard-built == whole-built") {
    val (a, b) = (keys.filter(abs(xxhash64($"k")) % 2 === 0),
      keys.filter(abs(xxhash64($"k")) % 2 === 1))
    val merged = Sketches.cmsBuild(a, "k", 64, 3)
      .unionByName(Sketches.cmsBuild(b, "k", 64, 3))
      .groupBy($"r", $"b").agg(sum($"c").as("c"))
    val whole = Sketches.cmsBuild(keys, "k", 64, 3)
    assert(merged.orderBy($"r", $"b").collect().toSeq ===
      whole.orderBy($"r", $"b").collect().toSeq)
  }
}
