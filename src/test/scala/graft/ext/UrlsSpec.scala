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

  test("hostOf: lowercases, strips www and port, empty on non-URLs") {
    import spark.implicits._
    val rows = Seq("HTTPS://WWW.Ex.COM:443/a?b#c", "http://ex.com/x",
      "ftp://files.ex.com", "not a url", "")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val out = rows.select(col("id"), Urls.hostOf(col("url")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "ex.com")
    assert(out(1L) === "ex.com")
    assert(out(2L) === "files.ex.com")
    assert(out(3L) === "")
    assert(out(4L) === "")
  }

  test("domainCap keeps at most k per host, deterministically") {
    import spark.implicits._
    // domain a: 30 docs, domain b: 3 — cap 5 trims only a
    val docs = ((1L to 30L).map(i => (i, s"https://a.com/$i")) ++
      (31L to 33L).map(i => (i, s"https://b.com/$i"))).toDF("doc_id", "url")
    val once = Urls.domainCap(docs, col("url"), k = 5)
      .select("doc_id", "domain").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(once.count(_._2 == "a.com") === 5)
    assert(once.count(_._2 == "b.com") === 3)
    // partition-invariant selection (hash draw, not arrival order)
    val again = Urls.domainCap(docs.repartition(7), col("url"), k = 5)
      .select("doc_id", "domain").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(once.toSet === again.toSet)
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
