package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import graft.streaming.CeProto._
import graft.streaming.SubscriptionRunner.Deliverable
import org.scalatest.funsuite.AnyFunSuite

/** The protobuf wire codec against hand-derived golden bytes (the public
  * protobuf encoding spec applied to cloudevents.proto:38-92 by hand),
  * decode round-trips, malformed-input bounds, and the gRPC batch sink
  * end-to-end against a local server that unframes and decodes what was
  * actually posted.
  */
class CeProtoSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("golden bytes: minimal CloudEvent (spec-derived by hand)") {
    // id="a"(field1) source="b"(2) spec_version="1.0"(3) type="t"(4),
    // no attributes, text_data "hi" (oneof field 7)
    val e = PbCloudEvent("a", "b", "1.0", "t", Nil, TextData("hi"))
    // 0a 01 61 | 12 01 62 | 1a 03 31 2e 30 | 22 01 74 | 3a 02 68 69
    assert(hex(encodeEvent(e)) === "0a0161120162" + "1a03312e30" + "220174" +
      "3a026869")
  }

  test("golden bytes: attribute map entry and BatchEvent envelope") {
    // one attribute: "k" -> ce_string "v"
    //   entry = 0a 01 6b (key) 12 03 1a 01 76 (value: ce_string field 3)
    //   event field 5 = 2a 08 <entry>
    val e = PbCloudEvent("a", "", "", "", Seq("k" -> CeString("v")), NoData)
    assert(hex(encodeEvent(e)) === "0a0161" + "2a08" + "0a016b" + "1203" + "1a0176")
    // BatchEvent: events=2 { batch { events=1 {event} } }, eventbus_id=3
    val b = PbBatchEvent(5L, Seq(PbCloudEvent("a", "", "", "", Nil, NoData)))
    // event = 0a 01 61 (3 bytes); batch = 0a 03 <event> (5);
    // outer = 12 05 <batch> 18 05
    assert(hex(encodeBatchEvent(b)) === "1205" + "0a03" + "0a0161" + "1805")
  }

  test("golden bytes: proto3 defaults are absent; set oneof arms are not") {
    assert(encodeEvent(PbCloudEvent("", "", "", "", Nil, NoData)).isEmpty)
    // a set-but-empty text_data arm must still appear (presence = arm)
    assert(hex(encodeEvent(PbCloudEvent("", "", "", "", Nil, TextData("")))) ===
      "3a00")
    // ce_boolean false likewise: field 1 varint 0 inside the value message
    val e = PbCloudEvent("", "", "", "", Seq("k" -> CeBoolean(false)), NoData)
    assert(hex(encodeEvent(e)) === "2a07" + "0a016b" + "1202" + "0800")
  }

  test("varint boundaries: multi-byte lengths and uint64 eventbus ids") {
    val big = "x" * 300 // length 300 = varint ac 02
    val e = PbCloudEvent(big, "", "", "", Nil, NoData)
    assert(hex(encodeEvent(e)).startsWith("0aac02"))
    val b = PbBatchEvent(Long.MinValue, Nil) // uint64 2^63: 10-byte varint
    assert(hex(encodeBatchEvent(b)) === "1200" + "1880808080808080808001")
    assert(decodeBatchEvent(encodeBatchEvent(b)).get.eventbusId === Long.MinValue)
  }

  test("encode/decode round trip across every attribute arm and data arm") {
    val events = Seq(
      PbCloudEvent("id1", "src", "1.0", "created", Seq(
        "datacontenttype" -> CeString("application/json"),
        "flag" -> CeBoolean(true),
        "n" -> CeInteger(-3), // negative int32: 10-byte sign-extended varint
        "raw" -> CeBytes(Array[Byte](0, 1, -1)),
        "u" -> CeUri("https://x.example/a"),
        "ur" -> CeUriRef("/rel"),
        "t" -> CeTimestamp(1700000000L, 123456789)),
        BinaryData("payload é".getBytes(StandardCharsets.UTF_8))),
      PbCloudEvent("id2", "s2", "1.0", "t2", Nil, TextData("text 北京")),
      PbCloudEvent("id3", "s3", "1.0", "t3", Nil,
        ProtoData("type.example/Doc", Array[Byte](9, 8, 7))),
      PbCloudEvent("id4", "s4", "1.0", "t4", Nil, NoData))
    val in = PbBatchEvent(42L, events)
    val out = decodeBatchEvent(encodeBatchEvent(in)).get
    assert(out.eventbusId === 42L)
    assert(out.events.size === 4)
    val e0 = out.events.head
    assert(e0.id === "id1" && e0.etype === "created")
    val attrs = e0.attributes.toMap
    assert(attrs("datacontenttype") === CeString("application/json"))
    assert(attrs("flag") === CeBoolean(true))
    assert(attrs("n") === CeInteger(-3))
    assert(attrs("raw").asInstanceOf[CeBytes].v.toSeq === Seq[Byte](0, 1, -1))
    assert(attrs("u") === CeUri("https://x.example/a"))
    assert(attrs("t") === CeTimestamp(1700000000L, 123456789))
    assert(e0.data.asInstanceOf[BinaryData].v.toSeq ===
      "payload é".getBytes(StandardCharsets.UTF_8).toSeq)
    assert(out.events(1).data === TextData("text 北京"))
    val pd = out.events(2).data.asInstanceOf[ProtoData]
    assert(pd.typeUrl === "type.example/Doc" && pd.value.toSeq === Seq[Byte](9, 8, 7))
    assert(out.events(3).data === NoData)
  }

  test("decoder skips unknown fields; rejects malformed input, never throws") {
    // append an unknown field 15 (varint 7) to a valid message — must decode
    val valid = encodeBatchEvent(PbBatchEvent(1L, Seq(
      PbCloudEvent("a", "", "", "", Nil, NoData))))
    val withUnknown = valid ++ Array[Byte](0x78, 0x07) // tag 15<<3|0, value 7
    assert(decodeBatchEvent(withUnknown).get.events.head.id === "a")
    // truncated varint / length past buffer / garbage
    assert(decodeBatchEvent(Array[Byte](0x12, 0x7f, 0x01)).isEmpty)
    assert(decodeBatchEvent(Array[Byte](0x12, -1)).isEmpty)
    for (junkLen <- Seq(1, 7, 33)) {
      val rnd = new scala.util.Random(junkLen)
      val junk = Array.fill(junkLen)(rnd.nextInt(256).toByte)
      decodeBatchEvent(junk) // any result is fine; throwing is not
    }
  }

  test("gRPC framing: 5-byte prefix round trip, compressed flag rejected") {
    val msg = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    val framed = grpcFrame(msg)
    assert(framed.length === 12 && framed(0) === 0)
    assert(framed.slice(1, 5).toSeq === Seq[Byte](0, 0, 0, 7))
    assert(grpcUnframe(framed).get.toSeq === msg.toSeq)
    assert(grpcUnframe(Array[Byte](1, 0, 0, 0, 1, 9)).isEmpty) // compressed
    assert(grpcUnframe(Array[Byte](0, 0, 0, 0, 9, 1)).isEmpty) // short
    assert(grpcUnframe(Array.emptyByteArray).isEmpty)
  }

  test("GrpcBatchSink posts a decodable framed BatchEvent to the Send path") {
    @volatile var gotPath: String = null
    @volatile var gotCt: String = null
    @volatile var decoded: Option[PbBatchEvent] = None
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        gotPath = x.getRequestURI.getPath
        gotCt = x.getRequestHeaders.getFirst("Content-Type")
        val body = x.getRequestBody.readAllBytes()
        decoded = grpcUnframe(body).flatMap(decodeBatchEvent)
        x.sendResponseHeaders(200, -1)
        x.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val sink = GrpcBatchSink(url, eventbusId = 7L)
      val res = sink(Seq(
        Deliverable(1L, "e1", "/src", "created", "application/json", """{"a":1}"""),
        Deliverable(2L, "e2", "/src", "deleted", null, "plain")))
      assert(res === Right(()))
      assert(gotPath === "/vanus.core.cloudevents.CloudEvents/Send")
      assert(gotCt === "application/grpc+proto")
      val batch = decoded.get
      assert(batch.eventbusId === 7L)
      assert(batch.events.map(_.id) === Seq("e1", "e2"))
      val e1 = batch.events.head
      assert(e1.source === "/src" && e1.specVersion === "1.0" &&
        e1.etype === "created")
      assert(e1.attributes.toMap.apply("datacontenttype") ===
        CeString("application/json"))
      assert(new String(e1.data.asInstanceOf[BinaryData].v,
        StandardCharsets.UTF_8) === """{"a":1}""")
      // null content type defaults like the reference's JSON path
      assert(batch.events(1).attributes.toMap.apply("datacontenttype") ===
        CeString("application/json"))
    } finally server.stop(0)
  }

  test("GrpcBatchSink maps non-2xx, timeout, and refused connections") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.getRequestBody.readAllBytes()
        x.sendResponseHeaders(503, -1); x.close()
      }
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val sink = GrpcBatchSink(s"http://127.0.0.1:$port")
      assert(sink(Seq(Deliverable(1L, "e", "s", "t", "text/plain", "x"))) ===
        Left(503))
    } finally server.stop(0)
    // refused (server stopped) → transport error 600
    val dead = GrpcBatchSink(s"http://127.0.0.1:$port", timeoutMillis = 800)
    assert(dead(Seq(Deliverable(1L, "e", "s", "t", "text/plain", "x"))) ===
      Left(HttpSink.ErrUnknown))
  }
}
