package graft.operators

import graft.SparkTestBase
import java.sql.Date
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("backward as-of attaches latest right row at or before left time") {
    val left = Seq(
      ("A", d("2024-01-10")), ("A", d("2024-02-10")), ("A", d("2024-03-10")))
      .toDF("symbol", "as_of")
    val right = Seq(
      ("A", d("2024-01-10"), 1.0), ("A", d("2024-02-15"), 2.0))
      .toDF("symbol", "rdate", "ta")

    val out = AsOfJoin.backward(left, right, Seq("symbol"), "as_of", "rdate", Seq("ta"))
      .orderBy("as_of").collect()
    // 01-10: same-day right row matches (at-or-before); 02-10: still 1.0; 03-10: 2.0
    assert(out.map(r => Option(r.getAs[java.lang.Double]("ta")).map(_.toDouble)).toSeq ===
      Seq(Some(1.0), Some(1.0), Some(2.0)))
  }

  test("no right row at or before → null columns") {
    val left = Seq(("A", d("2024-01-01"))).toDF("symbol", "as_of")
    val right = Seq(("A", d("2024-06-01"), 9.9)).toDF("symbol", "rdate", "ta")
    val out = AsOfJoin.backward(left, right, Seq("symbol"), "as_of", "rdate", Seq("ta")).collect()
    assert(out.head.isNullAt(out.head.fieldIndex("ta")))
  }

  test("row semantics: a null-valued right column overrides an older value") {
    val left = Seq(("A", d("2024-03-01"))).toDF("symbol", "as_of")
    val right = Seq(
      ("A", d("2024-01-01"), Some(1.0)),
      ("A", d("2024-02-01"), Option.empty[Double]))
      .toDF("symbol", "rdate", "ta")
    val out = AsOfJoin.backward(left, right, Seq("symbol"), "as_of", "rdate", Seq("ta")).collect()
    // polars join_asof attaches the ROW (with its null), not latest-non-null per column
    assert(out.head.isNullAt(out.head.fieldIndex("ta")))
  }

  test("keys separate groups") {
    val left = Seq(("A", d("2024-02-01")), ("B", d("2024-02-01"))).toDF("symbol", "as_of")
    val right = Seq(("A", d("2024-01-01"), 1.0)).toDF("symbol", "rdate", "ta")
    val out = AsOfJoin.backward(left, right, Seq("symbol"), "as_of", "rdate", Seq("ta"))
      .orderBy("symbol").collect()
    assert(Option(out(0).getAs[java.lang.Double]("ta")).isDefined)
    assert(out(1).isNullAt(out(1).fieldIndex("ta")))
  }

  test("numeric tiebreak orders natively, not lexicographically") {
    val left = Seq(("A", d("2024-02-01"))).toDF("symbol", "as_of")
    // two right rows at the SAME date; seq_no 10 must beat seq_no 9
    val right = Seq(
      ("A", d("2024-01-01"), 9L, 1.0),
      ("A", d("2024-01-01"), 10L, 2.0))
      .toDF("symbol", "rdate", "seq_no", "ta")
    val out = AsOfJoin.backward(left, right, Seq("symbol"), "as_of", "rdate",
      Seq("ta"), rightTieBreak = Seq("seq_no")).collect().head
    assert(out.getAs[Double]("ta") === 2.0)
  }

  test("tolerance nulls out matches older than the bound") {
    val left = Seq(("A", d("2024-06-01"))).toDF("symbol", "as_of")
    val right = Seq(("A", d("2024-01-01"), 1.0)).toDF("symbol", "rdate", "ta")
    val out = AsOfJoin.backward(left, right, Seq("symbol"), "as_of", "rdate", Seq("ta"),
      tolerance = Some(lit(30))) // DateType tolerance is in days
    val r = out.collect().head
    assert(r.isNullAt(r.fieldIndex("ta")))
  }

  test("forward as-of attaches earliest right row at or after left time") {
    val left = Seq(("A", 10L), ("A", 25L), ("A", 40L)).toDF("symbol", "t")
    val right = Seq(("A", 5L, 1.0), ("A", 25L, 2.0), ("A", 30L, 3.0))
      .toDF("symbol", "rt", "px")
    val got = AsOfJoin.forward(left, right, Seq("symbol"), "t", "rt", Seq("px"))
      .orderBy("t").collect()
    assert(got(0).getAs[Double]("px") === 2.0) // 10 → next at 25
    assert(got(1).getAs[Double]("px") === 2.0) // 25 → inclusive match at 25
    assert(got(2).isNullAt(got(2).fieldIndex("px"))) // 40 → nothing after
  }

  test("forward tolerance bounds the look-ahead") {
    val left = Seq(("A", 10L)).toDF("symbol", "t")
    val right = Seq(("A", 100L, 1.0)).toDF("symbol", "rt", "px")
    val r = AsOfJoin.forward(left, right, Seq("symbol"), "t", "rt", Seq("px"),
      tolerance = Some(lit(50))).collect().head
    assert(r.isNullAt(r.fieldIndex("px")))
  }

  test("nearest picks the closer side; equal distance prefers backward") {
    val left = Seq(("A", 10L), ("A", 20L), ("A", 33L), ("A", 3L))
      .toDF("symbol", "t")
    val right = Seq(("A", 8L, 1.0), ("A", 30L, 2.0)).toDF("symbol", "rt", "px")
    val got = AsOfJoin.nearest(left, right, Seq("symbol"), "t", "rt", Seq("px"))
      .orderBy("t").collect()
    assert(got(0).getAs[Double]("px") === 1.0) // t=3: only forward... 8 wins
    assert(got(1).getAs[Double]("px") === 1.0) // t=10: 2 back vs 20 fwd
    assert(got(2).getAs[Double]("px") === 2.0) // t=20: 12 back vs 10 fwd
    assert(got(3).getAs[Double]("px") === 2.0) // t=33: only backward side
    // equal distance: t=19 is 11 from both → backward (px=1.0)
    val tie = AsOfJoin.nearest(Seq(("A", 19L)).toDF("symbol", "t"), right,
      Seq("symbol"), "t", "rt", Seq("px")).collect().head
    assert(tie.getAs[Double]("px") === 1.0)
  }

  test("nearest tolerance bounds the winning distance") {
    val left = Seq(("A", 10L)).toDF("symbol", "t")
    val right = Seq(("A", 50L, 1.0), ("A", 90L, 2.0)).toDF("symbol", "rt", "px")
    val ok = AsOfJoin.nearest(left, right, Seq("symbol"), "t", "rt", Seq("px"),
      tolerance = Some(lit(45))).collect().head
    assert(ok.getAs[Double]("px") === 1.0) // 40 within 45
    val no = AsOfJoin.nearest(left, right, Seq("symbol"), "t", "rt", Seq("px"),
      tolerance = Some(lit(30))).collect().head
    assert(no.isNullAt(no.fieldIndex("px")))
  }
}
