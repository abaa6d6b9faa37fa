package graft.streaming

import graft.streaming.SubscriptionRunner.Deliverable
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Whole-batch delivery over HTTP in CloudEvents *batched* content mode
  * (one POST of `application/cloudevents-batch+json` carrying a JSON array
  * of events) — the library's stand-in for the reference's gRPC batch
  * client (client/grpc.go:63-85, batch accumulation trigger.go:342-375),
  * whose protobuf transport isn't expressible without gRPC deps; the
  * semantics that matter to the runner (one call per batch, one result for
  * every event in the call, timeout → 601, transport error → 600) are
  * identical.
  */
final class HttpBatchSink(url: String, timeoutMillis: Long = 5000)
  extends (Seq[Deliverable] => Either[Int, Unit]) with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis))
      .build()

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One event as a batched-mode JSON member. JSON-typed data embeds raw
    * (`data`), everything else as a string member — the two spellings the
    * CloudEvents JSON format defines.
    */
  private def eventJson(d: Deliverable): String = {
    val ct = Option(d.contentType).getOrElse("application/json")
    val data =
      if (ct.contains("json")) s""""data":${Option(d.body).getOrElse("null")}"""
      else s""""data":${jstr(Option(d.body).getOrElse(""))}"""
    s"""{"specversion":"1.0","id":${jstr(Option(d.id).getOrElse(d.sequenceNumber.toString))},""" +
      s""""source":${jstr(Option(d.source).getOrElse(""))},"type":${jstr(Option(d.etype).getOrElse(""))},""" +
      s""""datacontenttype":${jstr(ct)},$data}"""
  }

  override def apply(batch: Seq[Deliverable]): Either[Int, Unit] = {
    try {
      val body = batch.map(eventJson).mkString("[", ",", "]")
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "application/cloudevents-batch+json")
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
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

object HttpBatchSink {
  def apply(url: String, timeoutMillis: Long = 5000): HttpBatchSink =
    new HttpBatchSink(url, timeoutMillis)
}
