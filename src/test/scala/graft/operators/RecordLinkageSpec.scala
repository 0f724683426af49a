package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

class RecordLinkageSpec extends SparkTestBase {
  import spark.implicits._

  // block on the trailing 4-char code — perturbations live in the prefix
  private def bk(c: org.apache.spark.sql.Column) = substring(c, -4, 4)

  private def link(probes: DataFrame, refs: DataFrame, maxD: Int = 2) =
    RecordLinkage.link(probes, refs, "pid", "pname", "rid", "rname", bk, maxD)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1 else r.getInt(2)), r.getLong(3))).toMap

  private val refs = Seq(
    (100L, "acme corp 0017"),
    (101L, "acme corp 0018"),
    (102L, "zen labs 0017")).toDF("rid", "rname")

  test("typo within threshold links to the right record") {
    val out = link(Seq((1L, "acme c0rp 0017")).toDF("pid", "pname"), refs)
    assert(out(1L) == ((100L, 1, 1L)))
  }

  test("competing in-threshold candidates: argmin distance, ties to smaller id") {
    val competing = Seq(
      (200L, "acme corpse 0017"), // distance 2 from probe
      (201L, "acme c0rp 0017"), // distance 1
      (202L, "acme corq 0017") // distance 1 — ties with 201, larger id loses
    ).toDF("rid", "rname")
    val out = link(Seq((2L, "acme corp 0017")).toDF("pid", "pname"), competing)
    assert(out(2L) == ((201L, 1, 3L)))
  }

  test("over-threshold and out-of-block probes stay unmatched") {
    val out = link(Seq(
      (3L, "completely different 0017"), // same block, distance >> 2
      (4L, "acme corp 9999") // no such block
    ).toDF("pid", "pname"), refs)
    assert(out(3L) == ((-1L, -1, 0L)))
    assert(out(4L) == ((-1L, -1, 0L)))
  }

  test("n_candidates counts threshold survivors, not block size") {
    // block '0017' holds refs 100 and 102, but only 100 is within distance 2
    val out = link(Seq((5L, "acme corp 0017")).toDF("pid", "pname"), refs)
    assert(out(5L) == ((100L, 0, 1L)))
  }
}
