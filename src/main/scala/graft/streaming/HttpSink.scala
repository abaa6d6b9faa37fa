package graft.streaming

import graft.streaming.SubscriptionRunner.Deliverable
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** HTTP delivery client — the reference's primary sink protocol
  * (/root/reference/server/trigger/client/http.go, result mapping in
  * client/interface.go:35-70, protocol selection in trigger/util.go:35-52).
  *
  * POSTs the rendered event in CloudEvents HTTP *binary* content mode:
  * context attributes travel as `ce-*` headers, the data body is the HTTP
  * body with the event's datacontenttype. Result mapping mirrors the
  * reference: 2xx → delivered; request timeout → 601 (DeliveryTimeout,
  * retryable via `>= 500`... it is 601 ≥ 500 so the existing
  * [[Backoff.isRetryable]] treats it as retryable, same as the reference's
  * special-cased timeout retry); connect/IO error → 600 (errUnknown,
  * retryable); any other status → that status code.
  *
  * The gateway form (`NewHTTPClientWithGateway`) is the `gatewayHeader`
  * parameter: deliver to the gateway address and carry the real sink URL in
  * a header.
  *
  * Serialization: a Sink is shipped inside the delivery `mapPartitions`
  * closure, so the instance is Serializable and the JDK client (which is
  * not) is built lazily once per executor JVM.
  */
final class HttpSink(
    url: String,
    timeoutMillis: Long = 5000,
    gatewayHeader: Option[(String, String)] = None)
  extends (Deliverable => Either[Int, Unit]) with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis))
      .build()

  override def apply(d: Deliverable): Either[Int, Unit] = {
    try {
      val builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("Content-Type",
          Option(d.contentType).getOrElse("application/json"))
        .header("ce-specversion", "1.0")
        .header("ce-id", Option(d.id).getOrElse(d.sequenceNumber.toString))
        .header("ce-source", Option(d.source).getOrElse(""))
        .header("ce-type", Option(d.etype).getOrElse(""))
        .POST(HttpRequest.BodyPublishers.ofString(
          Option(d.body).getOrElse(""), StandardCharsets.UTF_8))
      gatewayHeader.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.discarding())
      val code = resp.statusCode()
      if (code >= 200 && code < 300) Right(()) else Left(code)
    } catch {
      case _: java.net.http.HttpTimeoutException => Left(HttpSink.ErrDeliveryTimeout)
      case scala.util.control.NonFatal(_) => Left(HttpSink.ErrUnknown)
    }
  }
}

object HttpSink {
  /** interface.go:67-70: 600 = unknown error, 601 = delivery timeout. */
  val ErrUnknown = 600
  val ErrDeliveryTimeout = 601

  def apply(url: String, timeoutMillis: Long = 5000): HttpSink =
    new HttpSink(url, timeoutMillis)

  /** Gateway form of NewHTTPClientWithGateway (http.go:36-41). */
  def withGateway(sinkUrl: String, gatewayUrl: String, headerKey: String,
      timeoutMillis: Long = 5000): HttpSink =
    new HttpSink(gatewayUrl, timeoutMillis, Some(headerKey -> sinkUrl))
}
