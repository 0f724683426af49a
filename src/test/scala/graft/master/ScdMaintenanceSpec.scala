package graft.master

import graft.SparkTestBase
import java.sql.Date
import org.apache.spark.sql.functions._

class ScdMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val master = Seq(
    (1001L, 1, "AAA", "A Co", "0000000001", "cu1", d("2020-01-01"), d("2024-06-30")),
    (1002L, 2, "BBB", "B Co", "0000000002", "cu2", d("2020-01-01"), d("2024-08-01")))
    .toDF("security_id", "permno", "symbol", "company", "cik", "cusip",
      "start_date", "end_date")

  private val snapshot = Seq(
    ("AAA", "0000000001", "A Co"),   // still listed -> extend
    ("CCC", "0000000003", "C Co"))   // new IPO -> add
    .toDF("symbol", "cik", "company")

  private val asOf = d("2024-08-01")

  test("applySnapshot extends stale end dates and adds IPOs with fresh ids (I7)") {
    val out = SecurityMaster.applySnapshot(master, snapshot, asOf).cache()
    assert(out.count() === 3)
    val aaa = out.filter($"symbol" === "AAA").collect().head
    assert(aaa.getAs[Date]("end_date") === asOf) // extended
    val bbb = out.filter($"symbol" === "BBB").collect().head
    assert(bbb.getAs[Date]("end_date") === d("2024-08-01")) // not stale, untouched
    val ccc = out.filter($"symbol" === "CCC").collect().head
    assert(ccc.getAs[Long]("security_id") === 1003L) // max + 1
    assert(ccc.getAs[Date]("start_date") === asOf)
    assert(ccc.isNullAt(ccc.fieldIndex("permno"))) // diagonal concat (U2)
  }

  test("repeated (symbol, cik) snapshot entries do not fan out master rows") {
    val dupSnapshot = Seq(
      ("AAA", "0000000001", "A Co"),
      ("AAA", "0000000001", "A Co"), // SEC re-export duplicate
      ("CCC", "0000000003", "C Co"))
      .toDF("symbol", "cik", "company")
    val out = SecurityMaster.applySnapshot(master, dupSnapshot, asOf)
    assert(out.count() === 3) // 2 existing + 1 added, no duplicated intervals
    assert(out.filter($"symbol" === "AAA").count() === 1)
  }

  test("rebrand matching joins disappeared to appeared on FIGI (J10)") {
    val disappeared = Seq(("FB", "FIGI123"), ("DEAD", "FIGI999")).toDF("symbol", "figi")
    val appeared = Seq(("META", "FIGI123"), ("NEWCO", "FIGI777")).toDF("symbol", "figi")
    val got = SecurityMaster.rebrandMatches(disappeared, appeared)
      .select("old_symbol", "new_symbol").as[(String, String)].collect()
    assert(got.toSeq === Seq(("FB", "META")))
  }

  test("delist grace retains recently-disappeared symbols (I7)") {
    val disappeared = Seq(
      ("OLD", d("2024-07-01")),  // 31 days before asOf -> confirmed
      ("NEW", d("2024-07-25")))  // 7 days -> within grace
      .toDF("symbol", "end_date")
    val got = SecurityMaster.confirmedDelists(disappeared, asOf)
      .select("symbol").as[String].collect()
    assert(got.toSeq === Seq("OLD"))
  }
}
