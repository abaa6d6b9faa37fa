// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import java.nio.charset.StandardCharsets

import graft.streaming.CeProto
import graft.streaming.CeProto._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Plan-side codecs for the CloudEvents gRPC wire payload ([[CeProto]]):
  * stored `BatchEvent` blobs (the bytes a gRPC publish carries,
  * cloudevents.proto:38-92) decode INSIDE the scan into typed rows, and a
  * per-row encoder builds the same blobs — the ingestion counterpart of
  * [[graft.streaming.GrpcBatchSink]], covering the `binary_data` /
  * `text_data` / `proto_data` payload arms the JSON ingest path
  * (EventJson: `data`/`data_base64`) cannot carry.
  *
  * Both are deterministic single static calls, so surrounding projections
  * stay in whole-stage codegen; the decoder inherits [[CeProto]]'s
  * bounded, throw-free handling of hostile bytes (malformed → NULL).
  */
object CeBatchUtil {

  /** Canonical string image of an attribute value, the form the
    * reference's filters compare (common.go:113-135 compares attribute
    * values as strings; bytes per CE JSON base64, timestamps RFC 3339).
    */
  private def attrText(v: AttrValue): String = v match {
    case CeBoolean(b) => if (b) "true" else "false"
    case CeInteger(i) => i.toString
    case CeString(s) => s
    case CeBytes(b) => java.util.Base64.getEncoder.encodeToString(b)
    case CeUri(s) => s
    case CeUriRef(s) => s
    case CeTimestamp(s, n) => java.time.Instant.ofEpochSecond(s, n.toLong).toString
  }

  private val utf8 = ThreadLocal.withInitial[java.nio.charset.CharsetDecoder](() =>
    StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT))

  private def textOrNull(b: Array[Byte]): UTF8String =
    try { utf8.get().decode(java.nio.ByteBuffer.wrap(b)); UTF8String.fromBytes(b) }
    catch { case _: java.nio.charset.CharacterCodingException => null }

  val eventType: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("source", StringType),
    StructField("specversion", StringType),
    StructField("type", StringType),
    StructField("datacontenttype", StringType),
    StructField("dataschema", StringType),
    StructField("attributes", MapType(StringType, StringType), nullable = false),
    StructField("data", BinaryType),
    // validated UTF-8 view of the payload (text_data always qualifies;
    // binary_data only when its bytes decode) — same contract as the WARC
    // walker's payload_text
    StructField("data_text", StringType)))

  val batchType: StructType = StructType(Seq(
    StructField("bus_id", LongType, nullable = false),
    StructField("events", ArrayType(eventType, containsNull = false),
      nullable = false)))

  private def eventRow(e: PbCloudEvent): GenericInternalRow = {
    val attrs = e.attributes
    val keys = new Array[Any](attrs.size)
    val vals = new Array[Any](attrs.size)
    var i = 0
    attrs.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      vals(i) = UTF8String.fromString(attrText(v))
      i += 1
    }
    val attrMap = attrs.toMap
    val ct = attrMap.get("datacontenttype").map(attrText).orNull
    // dataschema: the attribute, or proto_data's Any type_url
    // (api/cloudevents/protobuf.go:67-75 packs dataschema as the type_url)
    val ds = attrMap.get("dataschema").map(attrText)
      .orElse(e.data match {
        case ProtoData(u, _) if u.nonEmpty => Some(u)
        case _ => None
      }).orNull
    val (dataBytes, dataText) = e.data match {
      case NoData => (null, null)
      case BinaryData(b) => (b, textOrNull(b))
      case TextData(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        (b, UTF8String.fromString(s))
      case ProtoData(_, v) => (v, null) // proto bytes are never text
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(e.id),
      UTF8String.fromString(e.source),
      UTF8String.fromString(e.specVersion),
      UTF8String.fromString(e.etype),
      if (ct == null) null else UTF8String.fromString(ct),
      if (ds == null) null else UTF8String.fromString(ds),
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals)),
      dataBytes,
      dataText))
  }

  /** Decode a gRPC-framed (or bare) BatchEvent blob; null on malformed. */
  def decode(bin: Array[Byte]): GenericInternalRow = {
    val msg = CeProto.grpcUnframe(bin).getOrElse(bin)
    CeProto.decodeBatchEvent(msg) match {
      case Some(b) =>
        new GenericInternalRow(Array[Any](
          b.eventbusId,
          new GenericArrayData(b.events.map(eventRow).toArray[Any])))
      case None => null
    }
  }

  /** Encode one event as a framed single-event BatchEvent blob. */
  def encode(busId: Long, id: UTF8String, source: UTF8String,
      etype: UTF8String, ct: UTF8String, body: UTF8String): Array[Byte] = {
    def s(u: UTF8String): String = if (u == null) "" else u.toString
    val attrs =
      if (ct == null) Nil else Seq("datacontenttype" -> CeString(ct.toString))
    val data =
      if (body == null) NoData else BinaryData(body.getBytes)
    CeProto.grpcFrame(CeProto.encodeBatchEvent(PbBatchEvent(busId, Seq(
      PbCloudEvent(s(id), s(source), "1.0", s(etype), attrs, data)))))
  }

  /** Row adapter for [[CeBatchBytesExpr]]: fields in
    * (bus_id, id, source, type, datacontenttype, body) order. */
  def encodeRow(r: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    def str(i: Int): UTF8String = if (r.isNullAt(i)) null else r.getUTF8String(i)
    encode(if (r.isNullAt(0)) 0L else r.getLong(0),
      str(1), str(2), str(3), str(4), str(5))
  }
}

/** `ce_batch_events(bin)`: struct(bus_id, events array) from a stored
  * gRPC BatchEvent blob; NULL on malformed bytes.
  */
final case class CeBatchEventsExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = CeBatchUtil.batchType
  override def nullable: Boolean = true
  override def prettyName: String = "ce_batch_events"

  override def nullSafeEval(in: Any): Any =
    CeBatchUtil.decode(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = org.apache.spark.sql.graftexpr.CeBatchUtil.decode($c);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CeBatchEventsExpr =
    copy(child = newChild)
}

object CeBatchEventsExpr {
  def column(bin: Column): Column =
    ExpressionUtils.column(CeBatchEventsExpr(ExpressionUtils.expression(bin)))
}

/** `ce_batch_bytes(struct(bus_id, id, source, type, datacontenttype,
  * body))`: the framed single-event BatchEvent blob the gRPC sink would
  * post. Unary over a struct so the whole expression is one static call
  * under nullSafeCodeGen (the struct assembly itself is Catalyst-codegen'd
  * `CreateNamedStruct`); field order is positional — the [[column]]
  * builder is the supported construction path.
  */
final case class CeBatchBytesExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "ce_batch_bytes"

  override def nullSafeEval(in: Any): Any =
    CeBatchUtil.encodeRow(in.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.CeBatchUtil.encodeRow($c);")

  override protected def withNewChildInternal(newChild: Expression): CeBatchBytesExpr =
    copy(child = newChild)
}

object CeBatchBytesExpr {
  def column(busId: Column, id: Column, source: Column, etype: Column,
      ct: Column, body: Column): Column =
    ExpressionUtils.column(CeBatchBytesExpr(ExpressionUtils.expression(
      org.apache.spark.sql.functions.struct(
        busId.cast("long"), id.cast("string"), source.cast("string"),
        etype.cast("string"), ct.cast("string"), body.cast("string")))))
}
