package graft.functions

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WARC walker's contract: complete records in order, binary-safe
  * payload skip (Content-Length, never pattern scanning), bounded stop on
  * every malformed shape.
  */
class WarcSpec extends SparkSpec {

  private def rec(fields: Seq[(String, String)], payload: String): String =
    "WARC/1.0\r\n" +
      fields.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      s"Content-Length: ${payload.getBytes(StandardCharsets.UTF_8).length}\r\n\r\n" +
      payload + "\r\n\r\n"

  private def parse(blob: String) = {
    import spark.implicits._
    Seq(Tuple1(blob.getBytes(StandardCharsets.UTF_8))).toDF("bin")
      .select(posexplode(WarcRecords(col("bin"))).as(Seq("i", "r")))
      .select(col("i"), col("r.rec_type"), col("r.uri"),
        col("r.content_length"), col("r.payload"))
      .orderBy(col("i")).collect()
      .map(r => (r.getAs[String]("rec_type"), r.getAs[String]("uri"),
        r.getAs[Long]("content_length"), r.getAs[String]("payload")))
  }

  test("two records parse in order with exact fields") {
    val blob = rec(Seq("WARC-Type" -> "warcinfo"), "isPartOf!") +
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://x.com/1"), "hello world")
    val out = parse(blob)
    assert(out.toSeq === Seq(
      ("warcinfo", null, 9L, "isPartOf!"),
      ("response", "https://x.com/1", 11L, "hello world")))
  }

  test("payload containing WARC/ text is skipped by length, not scanned") {
    val tricky = "WARC/1.0\r\nContent-Length: 5\r\n\r\nfake!"
    val blob = rec(Seq("WARC-Type" -> "response"), tricky) +
      rec(Seq("WARC-Type" -> "metadata"), "tail.")
    val out = parse(blob)
    assert(out.length === 2)
    assert(out(0)._4 === tricky)
    assert(out(1)._1 === "metadata")
  }

  test("header names are case-insensitive; unknown headers ignored") {
    val blob = "WARC/1.0\r\nwarc-type: request\r\nX-Custom: y\r\n" +
      "content-length: 2\r\n\r\nok\r\n\r\n"
    assert(parse(blob).toSeq === Seq(("request", null, 2L, "ok")))
  }

  test("truncation keeps the complete prefix records only") {
    val full = rec(Seq("WARC-Type" -> "warcinfo"), "isPartOf!") +
      rec(Seq("WARC-Type" -> "response"), "hello world")
    // cut inside the second record's payload
    val cut = full.substring(0, full.length - 8)
    val out = parse(cut)
    assert(out.length === 1)
    assert(out(0)._1 === "warcinfo")
  }

  test("missing or bogus version/Content-Length yields no record") {
    assert(parse("HTTP/1.1 200 OK\r\n\r\n").isEmpty)
    assert(parse("WARC/1.0\r\nWARC-Type: x\r\n\r\npayload").isEmpty)
    assert(parse("").isEmpty)
  }
}
