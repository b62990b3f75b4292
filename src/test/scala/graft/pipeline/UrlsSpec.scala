package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalUrl: case, ports, fragments, tracking params, " +
      "param order, trailing slash") {
    // scheme + host lowercase; path case preserved
    assert(canon("HTTPS://Example.COM/Path") ==
      Seq("https://example.com/Path"))
    // default ports stripped per scheme; explicit others kept
    assert(canon("https://example.com:443/a", "http://example.com:80/a",
      "http://example.com:8080/a") ==
      Seq("https://example.com/a", "http://example.com/a",
        "http://example.com:8080/a"))
    // fragment dropped
    assert(canon("https://example.com/a#sec-2") ==
      Seq("https://example.com/a"))
    // tracking params dropped, survivors sorted bytewise
    assert(canon(
      "https://example.com/a?utm_source=x&b=2&a=1&fbclid=zz") ==
      Seq("https://example.com/a?a=1&b=2"))
    // all params tracking → no query part at all
    assert(canon("https://example.com/a?utm_campaign=c&gclid=g") ==
      Seq("https://example.com/a"))
    // trailing slash dropped off non-root; bare host → "/"
    assert(canon("https://example.com/a/", "https://example.com",
      "https://example.com/") ==
      Seq("https://example.com/a", "https://example.com/",
        "https://example.com/"))
    // null/blank/unparseable → null
    assert(canon("", "not a url") == Seq(null, null))
    // IPv6 literals keep their bracketed host intact (a bare [^:]+
    // would collide every IPv6 host into "[")
    assert(canon("http://[::1]:8080/a", "http://[2001:db8::2]/a",
      "https://[::1]:443/a") ==
      Seq("http://[::1]:8080/a", "http://[2001:db8::2]/a",
        "https://[::1]/a"))
    // plain ?ref= is resource-identifying (a git ref) — NOT stripped
    assert(canon("https://example.com/blob/x?ref=v1.0") ==
      Seq("https://example.com/blob/x?ref=v1.0"))
    assert(canon("https://example.com/a?ref_src=twsrc&b=1") ==
      Seq("https://example.com/a?b=1"))
  }

  test("urlDedup collapses spelling variants to one canonical row " +
      "with the variant count and bytewise-min representative") {
    val df = Seq(
      "https://Example.com/doc?utm_source=a",
      "https://example.com:443/doc",
      "https://example.com/doc/",
      "https://example.com/other").toDF("url")
    val out = Urls.urlDedup(df, "url")
      .orderBy("canonical_url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "https://example.com/doc")
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getString(2) == "https://Example.com/doc?utm_source=a")
    assert(out(1).getString(0) == "https://example.com/other")
    assert(out(1).getLong(1) == 1L)
  }
}
