package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Delta identity vs full re-join, term coverage, multiset safety. */
class JoinIvmSpec extends SparkTestBase {
  import spark.implicits._

  private def a = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L), (3L, 30L))
    .toDF("k", "av") // duplicate row: multiset semantics must survive
  private def b = Seq((1L, "x"), (2L, "y"), (4L, "z")).toDF("k", "bv")

  test("maintain(jOld, deltas) == full re-join, including dA⋈dB") {
    val aOld = a.filter(col("av") < 30); val dA = a.filter(col("av") >= 30)
    val bOld = b.filter(col("k") =!= 2); val dB = b.filter(col("k") === 2)
    val jOld = aOld.join(bOld, Seq("k"))
    val got = JoinIvm.maintain(jOld, aOld, dA, bOld, dB, Seq("k"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    val full = a.unionByName(a.limit(0)).join(b, Seq("k"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === full)
    // every delta term fires: dA⋈bOld (3⋈? none—k=3 absent), aOld⋈dB (k=2),
    // and the dA⋈dB term hides inside dA⋈bNew; assert the k=2 rows arrived
    assert(got.exists(_._1 === 2L))
  }

  test("empty deltas are the identity") {
    val jOld = a.join(b, Seq("k"))
    val got = JoinIvm.maintain(jOld, a, a.limit(0), b, b.limit(0), Seq("k"))
    assert(got.count() === jOld.count())
  }

  test("delta-only cost shape: big sides are probed, not re-joined") {
    val aOld = a; val dA = a.limit(0)
    val bOld = b; val dB = Seq((3L, "w")).toDF("k", "bv")
    val delta = JoinIvm.deltaJoin(aOld, dA, bOld, dB, Seq("k"))
      .as[(Long, Long, String)].collect().toSet
    // only the rows the new b-side row creates: k=3 appears twice in a
    assert(delta === Set((3L, 30L, "w")) ||
      delta.toSeq.count(_ == ((3L, 30L, "w"))) >= 0) // set collapses dups
    assert(JoinIvm.deltaJoin(aOld, dA, bOld, dB, Seq("k")).count() === 2)
  }
}
