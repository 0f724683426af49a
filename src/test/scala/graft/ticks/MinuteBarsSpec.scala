package graft.ticks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MinuteBarsSpec extends SparkTestBase {
  import spark.implicits._

  private def utc(s: String) = java.sql.Timestamp.valueOf(s)

  test("UTC → ET wall clock across the spring-forward DST boundary") {
    // 2024-03-10: 07:00 UTC = 02:00 EST → clocks jump to 03:00 EDT
    val rows = Seq(
      utc("2024-03-10 06:59:00"), // 01:59 EST
      utc("2024-03-10 07:00:00"), // 03:00 EDT (02:xx does not exist)
      utc("2024-03-10 14:30:00")) // 10:30 EDT (market open hour shifted)
      .toDF("utc_ts")
    val got = rows.select(MinuteBars.utcToEtWallClock($"utc_ts").cast("string"))
      .as[String].collect()
    assert(got.toSeq === Seq(
      "2024-03-10 01:59:00", "2024-03-10 03:00:00", "2024-03-10 10:30:00"))
  }

  test("UTC → ET across the fall-back boundary (repeated hour)") {
    // 2024-11-03: 05:30 UTC = 01:30 EDT; 06:30 UTC = 01:30 EST (again)
    val got = Seq(utc("2024-11-03 05:30:00"), utc("2024-11-03 06:30:00"))
      .toDF("utc_ts")
      .select(MinuteBars.utcToEtWallClock($"utc_ts").cast("string"))
      .as[String].collect()
    assert(got.toSeq === Seq("2024-11-03 01:30:00", "2024-11-03 01:30:00"))
  }

  test("round trip is identity outside ambiguous hours") {
    val ts = Seq(utc("2024-06-14 15:30:00"), utc("2024-01-05 20:00:00")).toDF("utc_ts")
    val rt = ts.select(
      MinuteBars.etWallClockToUtc(MinuteBars.utcToEtWallClock($"utc_ts")).as("back"),
      $"utc_ts")
    assert(rt.filter($"back" =!= $"utc_ts").count() === 0)
  }

  test("regular-session filter keeps 09:30-15:59 ET") {
    val wall = Seq("2024-06-14 09:29:00", "2024-06-14 09:30:00",
      "2024-06-14 15:59:00", "2024-06-14 16:00:00")
      .toDF("s").select($"s".cast("timestamp_ntz").as("ts"))
    val kept = wall.filter(MinuteBars.regularSession($"ts")).count()
    assert(kept === 2)
  }

  test("minute → daily rollup takes first/last by time and sums volume") {
    val m = Seq(
      (1L, "2024-06-14 09:30:00", 10.0, 10.5, 9.9, 10.2, 100L, 5L),
      (1L, "2024-06-14 09:31:00", 10.2, 11.0, 10.1, 10.9, 200L, 7L),
      (1L, "2024-06-14 15:59:00", 10.9, 11.2, 10.8, 11.1, 300L, 9L))
      .toDF("security_id", "s", "open", "high", "low", "close", "volume", "num_trades")
      .withColumn("ts", $"s".cast("timestamp_ntz")).drop("s")
    val d = MinuteBars.toDailyBars(m).collect().head
    assert(d.getAs[Double]("open") === 10.0)   // first bar's open
    assert(d.getAs[Double]("close") === 11.1)  // last bar's close
    assert(d.getAs[Double]("high") === 11.2)
    assert(d.getAs[Double]("low") === 9.9)
    assert(d.getAs[Long]("volume") === 600L)
  }

  test("daily VWAP weights by volume exactly; zero-volume day is null") {
    val m = Seq(
      (1L, "2024-06-14 09:30:00", 10.0, 100L), // 10.00 × 100
      (1L, "2024-06-14 09:31:00", 20.0, 300L), // 20.00 × 300
      (2L, "2024-06-14 09:30:00", 99.0, 0L) // zero volume — must be null
    ).toDF("security_id", "s", "close", "volume")
      .withColumn("ts", $"s".cast("timestamp_ntz")).drop("s")
    val out = MinuteBars.vwapDaily(m).collect()
      .map(r => r.getLong(0) -> r).toMap
    // (1000×100 + 2000×300) / 400 / 100 = 17.5 — exact dyadic, bit-equal
    assert(out(1L).getAs[Double]("vwap") === 17.5)
    assert(out(1L).getAs[Long]("volume") === 400L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("vwap")))
  }
}
