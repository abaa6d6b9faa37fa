package graft.streaming

import graft.streaming.SubscriptionRunner.Deliverable
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Whole-batch delivery speaking the reference's NATIVE wire format: one
  * POST per batch of a gRPC-framed protobuf `BatchEvent` (the exact
  * message of client/grpc.go:63-85 — `CloudEventBatch` of per-event
  * `CloudEvent` protos, built the way api/cloudevents/protobuf.go:36-76
  * builds them: datacontenttype as a `ce_string` attribute, body bytes as
  * the `binary_data` arm) to the `CloudEvents/Send` method path, content
  * type `application/grpc+proto`.
  *
  * Message bytes and the 5-byte gRPC message framing are wire-exact
  * ([[CeProto]]); the remaining documented seam is the channel itself:
  * java.net.http negotiates HTTP/2 via ALPN over TLS (where a gRPC server
  * speaks natively) but cannot open a prior-knowledge h2c connection, and
  * exposes no HTTP trailers, so the per-RPC `grpc-status` trailer is
  * approximated by the HTTP status (any 2xx ⇒ delivered — matching the
  * reference's Send, which treats a non-error RPC as whole-batch success).
  * Runner-facing semantics are identical to the reference's gRPC client:
  * one call per batch, one result for every event in the call,
  * timeout → 601, transport error → 600.
  */
final class GrpcBatchSink(url: String, eventbusId: Long = 0L,
    timeoutMillis: Long = 5000)
  extends (Seq[Deliverable] => Either[Int, Unit]) with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .version(HttpClient.Version.HTTP_2) // ALPN h2 over TLS, h1 upgrade otherwise
      .connectTimeout(Duration.ofMillis(timeoutMillis))
      .build()

  private def toProto(d: Deliverable): CeProto.PbCloudEvent = {
    val ct = Option(d.contentType).getOrElse("application/json")
    CeProto.PbCloudEvent(
      id = Option(d.id).getOrElse(d.sequenceNumber.toString),
      source = Option(d.source).getOrElse(""),
      specVersion = "1.0",
      etype = Option(d.etype).getOrElse(""),
      attributes = Seq("datacontenttype" -> CeProto.CeString(ct)),
      data = CeProto.BinaryData(Option(d.body).getOrElse("")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  override def apply(batch: Seq[Deliverable]): Either[Int, Unit] = {
    try {
      val msg = CeProto.encodeBatchEvent(
        CeProto.PbBatchEvent(eventbusId, batch.map(toProto)))
      val req = HttpRequest.newBuilder(
        URI.create(url.stripSuffix("/") + CeProto.SendMethodPath))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "application/grpc+proto")
        .POST(HttpRequest.BodyPublishers.ofByteArray(CeProto.grpcFrame(msg)))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
      val code = resp.statusCode()
      if (code >= 200 && code < 300) Right(()) else Left(code)
    } catch {
      case _: java.net.http.HttpTimeoutException => Left(HttpSink.ErrDeliveryTimeout)
      case scala.util.control.NonFatal(_) => Left(HttpSink.ErrUnknown)
    }
  }
}

object GrpcBatchSink {
  def apply(url: String, eventbusId: Long = 0L,
      timeoutMillis: Long = 5000): GrpcBatchSink =
    new GrpcBatchSink(url, eventbusId, timeoutMillis)
}
