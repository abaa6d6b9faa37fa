package graft.streaming

import java.nio.charset.StandardCharsets

/** Zero-dependency protobuf wire codec for the CloudEvents gRPC batch
  * surface — the exact messages of the reference's delivery RPC
  * (/root/reference/proto/vanus/core/cloudevents/cloudevents.proto:38-92:
  * `CloudEvent` with its attribute-value oneof, `CloudEventBatch`,
  * `BatchEvent`; RPC `CloudEvents.Send`), hand-encoded per the public
  * protobuf wire format (varint tags, length-delimited submessages) so
  * the batch sink can speak the reference's native transport without a
  * protobuf/gRPC dependency.
  *
  * Encoding rules honored: proto3 scalar defaults are omitted (empty
  * string, 0, false); map fields are repeated key/value entry messages in
  * insertion order; `oneof` emits exactly the set arm; unknown fields are
  * skipped (not errors) on decode, so a newer peer's extra fields pass
  * through harmlessly. The decoder bounds every length against the
  * remaining buffer — malformed input returns None, never a throw or an
  * over-read (same untrusted-input stance as the WARC/image walkers).
  */
object CeProto {

  // === model (mirrors the proto oneof shapes) ===============================

  sealed trait AttrValue
  final case class CeBoolean(v: Boolean) extends AttrValue
  final case class CeInteger(v: Int) extends AttrValue
  final case class CeString(v: String) extends AttrValue
  final case class CeBytes(v: Array[Byte]) extends AttrValue
  final case class CeUri(v: String) extends AttrValue
  final case class CeUriRef(v: String) extends AttrValue
  /** google.protobuf.Timestamp: seconds=1 (int64), nanos=2 (int32). */
  final case class CeTimestamp(seconds: Long, nanos: Int) extends AttrValue

  sealed trait Data
  case object NoData extends Data
  final case class BinaryData(v: Array[Byte]) extends Data
  final case class TextData(v: String) extends Data
  /** google.protobuf.Any: type_url=1, value=2 — the `proto_data` arm
    * (cloudevents.proto:53; type_url carries the event's dataschema,
    * api/cloudevents/protobuf.go:67-75).
    */
  final case class ProtoData(typeUrl: String, value: Array[Byte]) extends Data

  final case class PbCloudEvent(
      id: String,
      source: String,
      specVersion: String,
      etype: String,
      attributes: Seq[(String, AttrValue)] = Nil,
      data: Data = NoData)

  /** BatchEvent: field 1 reserved, events=2 (CloudEventBatch wrapping
    * repeated CloudEvent), eventbus_id=3 (uint64).
    */
  final case class PbBatchEvent(eventbusId: Long, events: Seq[PbCloudEvent])

  /** The RPC path a gRPC channel would POST (package.Service/Method). */
  val SendMethodPath = "/vanus.core.cloudevents.CloudEvents/Send"

  // === wire writer ==========================================================

  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    /** proto3 default-skip: empty string fields are absent on the wire. */
    def str(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) binAlways(field, s.getBytes(StandardCharsets.UTF_8))
    def bin(field: Int, b: Array[Byte]): Unit =
      if (b != null && b.length > 0) binAlways(field, b)
    /** Length-delimited even when empty — a set oneof arm / present
      * submessage must be emitted regardless of content. */
    def binAlways(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def uint64(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); varint(v) }
    def int32(field: Int, v: Int): Unit =
      // negative int32 sign-extends to 10 varint bytes per the wire spec
      if (v != 0) { tag(field, 0); varint(v.toLong) }
    def bool(field: Int, v: Boolean): Unit =
      if (v) { tag(field, 0); varint(1L) }
  }

  private def timestampBytes(t: CeTimestamp): Array[Byte] = {
    val w = new W
    // int64: varint(Long) sign-extends negatives to the spec's 10 bytes
    w.uint64(1, t.seconds)
    w.int32(2, t.nanos)
    w.bytes
  }

  private def attrValueBytes(v: AttrValue): Array[Byte] = {
    val w = new W
    v match {
      // oneof arms always emit, even at the scalar default — presence IS
      // the arm selection (encoding a set `ce_boolean: false` as nothing
      // would decode as an unset oneof)
      case CeBoolean(b) => w.varint((1L << 3) | 0); w.varint(if (b) 1L else 0L)
      case CeInteger(i) => w.varint((2L << 3) | 0); w.varint(i.toLong)
      case CeString(s) => w.binAlways(3, s.getBytes(StandardCharsets.UTF_8))
      case CeBytes(b) => w.binAlways(4, b)
      case CeUri(s) => w.binAlways(5, s.getBytes(StandardCharsets.UTF_8))
      case CeUriRef(s) => w.binAlways(6, s.getBytes(StandardCharsets.UTF_8))
      case t: CeTimestamp => w.binAlways(7, timestampBytes(t))
    }
    w.bytes
  }

  private def anyBytes(typeUrl: String, value: Array[Byte]): Array[Byte] = {
    val w = new W
    w.str(1, typeUrl)
    w.bin(2, value)
    w.bytes
  }

  def encodeEvent(e: PbCloudEvent): Array[Byte] = {
    val w = new W
    w.str(1, e.id)
    w.str(2, e.source)
    w.str(3, e.specVersion)
    w.str(4, e.etype)
    e.attributes.foreach { case (k, v) =>
      // map<string, AttributeValue> = repeated entry{key=1, value=2}
      val entry = new W
      entry.str(1, k)
      entry.binAlways(2, attrValueBytes(v))
      w.binAlways(5, entry.bytes)
    }
    e.data match {
      case NoData => ()
      case BinaryData(b) => w.binAlways(6, b)
      case TextData(s) => w.binAlways(7, s.getBytes(StandardCharsets.UTF_8))
      case ProtoData(u, v) => w.binAlways(8, anyBytes(u, v))
    }
    w.bytes
  }

  def encodeBatchEvent(b: PbBatchEvent): Array[Byte] = {
    val batch = new W
    b.events.foreach(e => batch.binAlways(1, encodeEvent(e)))
    val w = new W
    w.binAlways(2, batch.bytes)
    w.uint64(3, b.eventbusId)
    w.bytes
  }

  /** gRPC message framing (HTTP/2 DATA payload): 1-byte compressed flag
    * (0 = identity) + 4-byte big-endian message length + message.
    */
  def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(0) = 0
    out(1) = (msg.length >>> 24).toByte
    out(2) = (msg.length >>> 16).toByte
    out(3) = (msg.length >>> 8).toByte
    out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  def grpcUnframe(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 5 || b(0) != 0) return None // compressed frames unsupported
    val len = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    if (len < 0 || 5 + len > b.length) None
    else Some(java.util.Arrays.copyOfRange(b, 5, 5 + len))
  }

  // === wire reader ==========================================================

  private final class R(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    /** Read a field tag; field number 0 is invalid per the wire spec —
      * rejecting it here (like real protobuf parsers) keeps zero-prefixed
      * garbage (e.g. a truncated gRPC frame parsed as a bare message)
      * from silently mis-decoding.
      */
    def tag(): Long = {
      val t = varint()
      if ((t >> 3) == 0) throw new IllegalArgumentException("field number 0")
      t
    }
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val byte = b(pos) & 0xff
        pos += 1
        v |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("varint overlong")
    }
    def lenDelim(): R = {
      val n = varint()
      if (n < 0 || pos + n > end) throw new IllegalArgumentException("length past buffer")
      val r = new R(b, pos, pos + n.toInt)
      pos += n.toInt
      r
    }
    def lenBytes(): Array[Byte] = {
      val r = lenDelim()
      java.util.Arrays.copyOfRange(b, r.pos, r.end)
    }
    def lenString(): String = {
      val r = lenDelim()
      new String(b, r.pos, r.end - r.pos, StandardCharsets.UTF_8)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8; require(pos <= end, "truncated fixed64")
      case 2 => lenDelim()
      case 5 => pos += 4; require(pos <= end, "truncated fixed32")
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def readTimestamp(r: R): CeTimestamp = {
    var secs = 0L; var nanos = 0
    while (r.hasMore) {
      val t = r.tag()
      (t >> 3, (t & 7).toInt) match {
        case (1, 0) => secs = r.varint()
        case (2, 0) => nanos = r.varint().toInt
        case (_, w) => r.skip(w)
      }
    }
    CeTimestamp(secs, nanos)
  }

  private def readAttrValue(r: R): Option[AttrValue] = {
    var out: Option[AttrValue] = None
    while (r.hasMore) {
      val t = r.tag()
      (t >> 3, (t & 7).toInt) match {
        case (1, 0) => out = Some(CeBoolean(r.varint() != 0))
        case (2, 0) => out = Some(CeInteger(r.varint().toInt))
        case (3, 2) => out = Some(CeString(r.lenString()))
        case (4, 2) => out = Some(CeBytes(r.lenBytes()))
        case (5, 2) => out = Some(CeUri(r.lenString()))
        case (6, 2) => out = Some(CeUriRef(r.lenString()))
        case (7, 2) => out = Some(readTimestamp(r.lenDelim()))
        case (_, w) => r.skip(w)
      }
    }
    out
  }

  private def readEvent(r: R): PbCloudEvent = {
    var id = ""; var source = ""; var spec = ""; var etype = ""
    val attrs = Seq.newBuilder[(String, AttrValue)]
    var data: Data = NoData
    while (r.hasMore) {
      val t = r.tag()
      (t >> 3, (t & 7).toInt) match {
        case (1, 2) => id = r.lenString()
        case (2, 2) => source = r.lenString()
        case (3, 2) => spec = r.lenString()
        case (4, 2) => etype = r.lenString()
        case (5, 2) =>
          val e = r.lenDelim()
          var k = ""; var v: Option[AttrValue] = None
          while (e.hasMore) {
            val et = e.tag()
            (et >> 3, (et & 7).toInt) match {
              case (1, 2) => k = e.lenString()
              case (2, 2) => v = readAttrValue(e.lenDelim())
              case (_, w) => e.skip(w)
            }
          }
          v.foreach(vv => attrs += (k -> vv))
        case (6, 2) => data = BinaryData(r.lenBytes())
        case (7, 2) => data = TextData(r.lenString())
        case (8, 2) =>
          val a = r.lenDelim()
          var url = ""; var value = Array.emptyByteArray
          while (a.hasMore) {
            val at = a.tag()
            (at >> 3, (at & 7).toInt) match {
              case (1, 2) => url = a.lenString()
              case (2, 2) => value = a.lenBytes()
              case (_, w) => a.skip(w)
            }
          }
          data = ProtoData(url, value)
        case (_, w) => r.skip(w)
      }
    }
    PbCloudEvent(id, source, spec, etype, attrs.result(), data)
  }

  /** Decode a BatchEvent; None on any malformed shape. */
  def decodeBatchEvent(bytes: Array[Byte]): Option[PbBatchEvent] =
    try {
      val r = new R(bytes, 0, bytes.length)
      var busId = 0L
      val events = Seq.newBuilder[PbCloudEvent]
      while (r.hasMore) {
        val t = r.tag()
        (t >> 3, (t & 7).toInt) match {
          case (2, 2) =>
            val batch = r.lenDelim()
            while (batch.hasMore) {
              val bt = batch.tag()
              (bt >> 3, (bt & 7).toInt) match {
                case (1, 2) => events += readEvent(batch.lenDelim())
                case (_, w) => batch.skip(w)
              }
            }
          case (3, 0) => busId = r.varint()
          case (_, w) => r.skip(w)
        }
      }
      Some(PbBatchEvent(busId, events.result()))
    } catch { case _: IllegalArgumentException => None }
}
