package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(TextFunctions.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(norm("HTTPS://WWW.Example.COM/Docs/Page") ==
      Seq("https://www.example.com/Docs/Page"))
  }

  test("default ports stripped per scheme; non-default ports kept") {
    assert(norm(
      "http://a.com:80/x", "https://a.com:443/x", "https://a.com:8080/x",
      "http://a.com:443/x") == Seq(
      "http://a.com/x", "https://a.com/x", "https://a.com:8080/x",
      // :443 is NOT http's default — identity must keep it
      "http://a.com:443/x"))
  }

  test("fragment dropped; tracking params removed; survivors sorted; empty query elided") {
    assert(norm("https://a.com/p?utm_source=x&b=2&a=1#frag") ==
      Seq("https://a.com/p?a=1&b=2"))
    assert(norm("https://a.com/p?fbclid=abc&gclid=def&utm_campaign=z") ==
      Seq("https://a.com/p"))
    // parameter ORDER is not identity
    assert(norm("https://a.com/p?b=2&a=1") == norm("https://a.com/p?a=1&b=2"))
  }

  test("duplicate path slashes collapse; trailing slashes strip; root collapses to bare host") {
    assert(norm("https://a.com//x///y/") == Seq("https://a.com/x/y"))
    assert(norm("https://a.com/") == Seq("https://a.com"))
  }

  test("idempotent: normalizing a normalized URL is the identity") {
    val raw = Seq("HTTP://A.Com:80//p//q/?utm_source=s&z=1&a=2#f",
      "https://b.org:8080/Keep/Case?x=1")
    val once = norm(raw: _*)
    assert(norm(once: _*) == once)
  }
}
