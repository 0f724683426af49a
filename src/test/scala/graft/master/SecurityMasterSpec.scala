package graft.master

import graft.SparkTestBase
import java.sql.Date
import org.apache.spark.sql.functions._

class SecurityMasterSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // (permno, symbol, company, cik, cusip, start, end)
  private val history = Seq(
    // permno 1: FB renamed to META, same CIK → same security
    (1, "FB", "Meta Platforms", "0001326801", "30303M10", "2012-05-18", "2022-06-08"),
    (1, "META", "Meta Platforms", "0001326801", "30303M10", "2022-06-09", "2024-12-31"),
    // permno 2: symbol AND cik change → new business under same permno
    (2, "OLD", "Old Co", "0000000002", "11111111", "2010-01-01", "2015-12-31"),
    (2, "NEW", "New Co", "0000000099", "22222222", "2016-01-01", "2024-12-31"),
    // permno 3: independent security that later reuses symbol OLD
    (3, "OLD", "Other Old", "0000000003", "33333333", "2018-01-01", "2024-12-31"))
    .map { case (p, s, co, ck, cu, st, en) => (p, s, co, ck, cu, d(st), d(en)) }
    .toDF("permno", "symbol", "company", "cik", "cusip", "start_date", "end_date")

  lazy val master = SecurityMaster.assignSecurityIds(history).cache()

  test("rename with CIK continuity keeps one security_id (FB→META)") {
    val ids = master.filter($"permno" === 1).select("security_id")
      .distinct().as[Long].collect()
    assert(ids.length === 1)
  }

  test("symbol+CIK change under same permno starts a new security") {
    val ids = master.filter($"permno" === 2)
      .orderBy("start_date").select("security_id").as[Long].collect()
    assert(ids.length === 2)
    assert(ids(0) !== ids(1))
  }

  test("ids are dense from 1001 in (permno, start_date) order") {
    val ids = master.orderBy("permno", "start_date")
      .select("security_id").as[Long].collect().distinct
    assert(ids.toSeq === Seq(1001L, 1002L, 1003L, 1004L))
  }

  test("exact resolve: FB before rename, META after, under one sid") {
    val q = Seq(("FB", d("2020-01-01")), ("META", d("2023-01-01")))
      .toDF("symbol", "day")
    val got = SecurityMaster.resolveExact(q, master)
      .select("security_id").as[Long].collect().distinct
    assert(got.length === 1)
  }

  test("fuzzy resolve: FB queried after rename routes to the META security") {
    val q = Seq(("FB", d("2023-06-01"))).toDF("symbol", "day")
    val metaSid = master.filter($"symbol" === "META")
      .select("security_id").as[Long].head()
    val got = SecurityMaster.resolve(q, master).select("security_id").as[Long].head()
    assert(got === metaSid)
  }

  test("fuzzy resolve picks temporally closest symbol usage") {
    // Symbol OLD used by sid(permno2-era1) until 2015 and sid(permno3) from 2018.
    // Query day 2019: permno2's first security is inactive (ended 2015) →
    // only permno3's is active → resolves there.
    val q = Seq(("OLD", d("2019-06-01"))).toDF("symbol", "day")
    val sid3 = master.filter($"permno" === 3).select("security_id").as[Long].head()
    val got = SecurityMaster.resolve(q, master).select("security_id").as[Long].head()
    assert(got === sid3)
  }

  test("duplicate probe rows keep their multiplicity through resolution") {
    // two IDENTICAL fact rows (e.g. two equal trades) must stay two rows
    val q = Seq(("FB", d("2020-01-01")), ("FB", d("2020-01-01")))
      .toDF("symbol", "day")
    val got = SecurityMaster.resolveExact(q, master)
    assert(got.count() === 2)
    assert(got.filter($"security_id".isNotNull).count() === 2)
  }

  test("unresolvable symbol yields null sid") {
    val q = Seq(("ZZZZ", d("2020-01-01"))).toDF("symbol", "day")
    val got = SecurityMaster.resolve(q, master).select("security_id").collect()
    assert(got.head.isNullAt(0))
  }

  test("symbol normalization: BRK.B → BRKB") {
    val got = Seq("BRK.B", "brk-b").toDF("s")
      .select(SecurityMaster.normalizeSymbol($"s").as("n")).as[String].collect()
    assert(got.toSeq === Seq("BRKB", "BRKB"))
  }

  test("symbolHistory aggregates usage intervals per symbol") {
    val sid = master.filter($"symbol" === "FB").select("security_id").as[Long].head()
    val hist = SecurityMaster.symbolHistory(master, sid)
      .orderBy("start_date")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDate(2).toString))
    assert(hist.toSeq === Seq(
      ("FB", "2012-05-18", "2022-06-08"),
      ("META", "2022-06-09", "2024-12-31")))
  }
}
