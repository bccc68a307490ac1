package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.UrlOps

class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).first().getString(0)

  test("scheme/host lowercased, www stripped, default ports dropped, fragment cut") {
    assert(canon("HTTP://WWW.Site.COM:80/a#frag") == "http://site.com/a")
    assert(canon("https://Site.com:443/") == "https://site.com/")
    // non-default port survives; so does a default port on the OTHER scheme
    assert(canon("http://site.com:8080/a") == "http://site.com:8080/a")
    assert(canon("https://site.com:80/a") == "https://site.com:80/a")
  }

  test("path: duplicate slashes collapse, one trailing slash drops, case survives") {
    assert(canon("http://h//a//B///c/") == "http://h/a/B/c")
    assert(canon("http://h") == "http://h/")
    assert(canon("http://h/") == "http://h/")
  }

  test("query: tracking params out, remainder sorted, empty query drops the '?'") {
    assert(canon("http://h/p?b=2&utm_source=rss&a=1&gclid=x&fbclid=y&ref=z")
      == "http://h/p?a=1&b=2")
    assert(canon("http://h/p?utm_campaign=x") == "http://h/p")
    assert(canon("http://h/p?") == "http://h/p")
    // utm must be a PREFIX param name, not a substring elsewhere
    assert(canon("http://h/p?xutm_a=1") == "http://h/p?xutm_a=1")
  }

  test("unparseable input passes through trimmed, never nulled") {
    assert(canon("  not a url  ") == "not a url")
    assert(canon("mailto:a@b.c") == "mailto:a@b.c")
  }

  test("equivalence class: the messy spellings of one page collapse") {
    val variants = Seq(
      "HTTP://WWW.Example.com:80//x//y/?b=2&a=1&utm_source=feed#top",
      "http://example.com/x/y?a=1&b=2",
      "http://Example.COM/x/y/?gclid=abc&a=1&b=2")
    assert(variants.map(canon).distinct == Seq("http://example.com/x/y?a=1&b=2"))
  }

  test("urlHost: the per-site group-by key") {
    val host = Seq("HTTPS://WWW.News.Site.ORG/a?x=1").toDF("u")
      .select(UrlOps.urlHost(col("u"))).first().getString(0)
    assert(host == "news.site.org")
  }
}
