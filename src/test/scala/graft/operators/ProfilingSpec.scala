package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ANALYZE-style profiling: exact counts and type-aware extremes. */
class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(2.5), Some("aa")),
    (2L, None, Some("bbbb")),
    (3L, Some(-1.25), None),
    (3L, Some(2.5), Some(""))
  ).toDF("k", "v", "s")

  test("numeric column: nulls, exact distincts, micro extremes") {
    val p = Profiling.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) === 4L && k.getLong(2) === 0L && k.getLong(3) === 3L)
    assert(k.getLong(4) === 1000000L && k.getLong(5) === 3000000L)
    assert(k.isNullAt(6) && k.isNullAt(7) && k.isNullAt(8))
    val v = p("v")
    assert(v.getLong(2) === 1L) // one null
    assert(v.getLong(3) === 2L) // distinct ignores null: {2.5, -1.25}
    assert(v.getLong(4) === -1250000L && v.getLong(5) === 2500000L)
  }

  test("string column: length stats skip nulls; empty string counts") {
    val p = Profiling.profile(df, Seq("s")).collect()
    assert(p.length === 1)
    val s = p.head
    assert(s.getLong(2) === 1L && s.getLong(3) === 3L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getLong(6) === 0L && s.getLong(7) === 4L && s.getLong(8) === 6L)
  }

  test("single scan: profiling is one job over one aggregate") {
    // the long form always has exactly |cols| rows regardless of data size
    assert(Profiling.profile(df, Seq("k", "v")).count() === 2L)
  }
}
