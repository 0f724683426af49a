package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** URL canonicalization rules, one hand-built case per rule. */
class UrlNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(UrlNormalize.canonicalUrl(col("u"))).as[String].head()

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Ex.COM/KeepCase") === "https://www.ex.com/KeepCase")
  }

  test("default ports strip, non-default ports survive") {
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("http://a.com:443/x") === "http://a.com:443/x") // not http's default
    assert(canon("https://a.com:8443/x") === "https://a.com:8443/x")
  }

  test("tracking params drop, survivors sort, fragment drops") {
    assert(canon("https://a.com/p?z=1&utm_source=x&a=2&fbclid=q&gclid=r#frag")
      === "https://a.com/p?a=2&z=1")
    // all params tracking -> no '?' at all
    assert(canon("https://a.com/p?utm_a=1&utm_b=2") === "https://a.com/p")
  }

  test("trailing slashes strip; root collapses; empty query tolerated") {
    assert(canon("https://a.com/p/") === "https://a.com/p")
    assert(canon("https://a.com/p///") === "https://a.com/p")
    assert(canon("https://a.com/") === "https://a.com")
    assert(canon("https://a.com") === "https://a.com")
    assert(canon("https://a.com/p?") === "https://a.com/p")
  }

  test("canonicalization is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Ex.COM:443/A/?utm_source=f&b=2&a=1#x",
      "http://h.org:8080/p/q?y=2&z=9",
      "https://a.com")
    urls.foreach { u => assert(canon(canon(u)) === canon(u), u) }
  }

  test("host/scheme/port accessors") {
    val df = Seq("HTTP://A.B.Com:8080/x?q=1").toDF("u")
    val r = df.select(
      UrlNormalize.scheme(col("u")), UrlNormalize.host(col("u")),
      UrlNormalize.port(col("u"))).as[(String, String, String)].head()
    assert(r === (("http", "a.b.com", "8080")))
  }
}
