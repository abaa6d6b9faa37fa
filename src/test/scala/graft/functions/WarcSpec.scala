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

  private def parseBytes(bin: Array[Byte]) = {
    import spark.implicits._
    Seq(Tuple1(bin)).toDF("bin")
      .select(posexplode(WarcRecords(col("bin"))).as(Seq("i", "r")))
      .select(col("i"), col("r.rec_type"), col("r.uri"),
        col("r.content_length"), col("r.payload"), col("r.payload_text"))
      .orderBy(col("i")).collect()
  }

  // text view: payload_text carries the validated UTF-8 decode
  private def parse(blob: String) =
    parseBytes(blob.getBytes(StandardCharsets.UTF_8))
      .map(r => (r.getAs[String]("rec_type"), r.getAs[String]("uri"),
        r.getAs[Long]("content_length"), r.getAs[String]("payload_text")))

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

  test("binary (non-UTF-8) payload: raw bytes exact, payload_text null") {
    // a gzip-magic-shaped body with bytes no UTF-8 decode accepts
    val body = Array[Byte](0x1f, 0x8b.toByte, 0xff.toByte, 0x00,
      0xc3.toByte, 0x28, 0xfe.toByte)
    val head = s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val blob = head.getBytes(StandardCharsets.UTF_8) ++ body ++
      "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    val out = parseBytes(blob)
    assert(out.length === 1)
    assert(out(0).getAs[Long]("content_length") === body.length.toLong)
    assert(out(0).getAs[Array[Byte]]("payload").toSeq === body.toSeq,
      "binary payload must round-trip byte-exact")
    assert(out(0).getAs[String]("payload_text") == null,
      "invalid UTF-8 must not masquerade as a string")
  }

  test("valid UTF-8 multibyte payload decodes to payload_text exactly") {
    val text = "héllo wörld — ∑ bytes ≠ chars"
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val blob = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${bytes.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8) ++
      bytes ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    val out = parseBytes(blob)
    assert(out.length === 1)
    assert(out(0).getAs[String]("payload_text") === text)
    assert(out(0).getAs[Array[Byte]]("payload").toSeq === bytes.toSeq)
  }

  test("missing or bogus version/Content-Length yields no record") {
    assert(parse("HTTP/1.1 200 OK\r\n\r\n").isEmpty)
    assert(parse("WARC/1.0\r\nWARC-Type: x\r\n\r\npayload").isEmpty)
    assert(parse("").isEmpty)
  }
}
