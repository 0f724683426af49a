package graft.ticks

import graft.SparkTestBase
import java.sql.Date

class CalendarSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("weekday spine skips weekends") {
    // 2024-01-05 Fri .. 2024-01-09 Tue → Fri, Mon, Tue
    val got = Calendar.weekdaySpine(spark, "2024-01-05", "2024-01-09")
      .orderBy("date").as[Date].collect().map(_.toString)
    assert(got.toSeq === Seq("2024-01-05", "2024-01-08", "2024-01-09"))
  }

  test("align emits null-OHLCV rows for non-traded days within bounds") {
    val bars = Seq(
      (1L, d("2024-01-05"), 10.0), (1L, d("2024-01-09"), 11.0))
      .toDF("security_id", "date", "close")
    val spine = Calendar.weekdaySpine(spark, "2024-01-01", "2024-01-31")
    val out = Calendar.align(bars, spine).orderBy("date").collect()
    assert(out.length === 3) // Fri, Mon(null), Tue
    assert(out(1).isNullAt(2))
    // P4: dropping all-null rows recovers the original bars
    assert(Calendar.dropAllNullRows(Calendar.align(bars, spine), Seq("close")).count() === 2)
  }
}
