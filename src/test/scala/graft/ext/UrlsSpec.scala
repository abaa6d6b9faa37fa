package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("canonicalizeUrl: case, port, www, fragment, utm, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/?utm_source=a&x=1#frag")
      === Seq("https://example.com/Path/?x=1"))
    assert(canon("http://example.com:80/") === Seq("http://example.com"))
    assert(canon("https://example.com/a?utm_a=1&utm_b=2")
      === Seq("https://example.com/a"))
    assert(canon("https://example.com/a?utm_only=1")
      === Seq("https://example.com/a"))
    assert(canon("https://example.com/a?keep=1&utm_mid=2&also=3")
      === Seq("https://example.com/a?keep=1&also=3"))
    // >=4 consecutive utm params: the standard 5-param utm set collapses
    // entirely (a non-repeated replacement would leave every other param)
    assert(canon("https://example.com/a?utm_source=s&utm_medium=m&utm_campaign=c&utm_term=t&utm_content=x")
      === Seq("https://example.com/a"))
    assert(canon("https://example.com/a?utm_a=1&utm_b=2&utm_c=3&utm_d=4&x=1")
      === Seq("https://example.com/a?x=1"))
    assert(canon("https://example.com/a?keep=1&utm_a=1&utm_b=2&utm_c=3&utm_d=4")
      === Seq("https://example.com/a?keep=1"))
    // path case is preserved; only scheme+authority fold
    assert(canon("HTTP://EXAMPLE.com/CaseSensitive")
      === Seq("http://example.com/CaseSensitive"))
    // non-default port survives
    assert(canon("https://example.com:8443/x")
      === Seq("https://example.com:8443/x"))
  }

  test("dedupByUrl groups doc variants of one canonical form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HTTPS://WWW.a.com/x"),
      (2L, "https://a.com/x/"),
      (3L, "https://a.com/x#frag"),
      (4L, "https://b.com/y")).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(docs, col("url")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("https://a.com/x") === ((1L, 3L)))
    assert(out("https://b.com/y") === ((4L, 1L)))
  }
}
