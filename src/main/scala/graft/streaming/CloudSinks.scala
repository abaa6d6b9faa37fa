package graft.streaming

import graft.streaming.SubscriptionRunner.Deliverable
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Locale

/** Serverless delivery clients — the reference's Lambda / GCloud Functions
  * sinks (/root/reference/server/trigger/client/lambda.go,
  * gcloud_functions.go), rebuilt on the JDK HTTP client with no cloud SDK:
  *
  *  - [[LambdaSink]] signs and POSTs the public Lambda Invoke REST API
  *    (`/2015-03-31/functions/{name}/invocations`) with a real [[SigV4]]
  *    Authorization — byte-for-byte what aws-sdk-go's v4 signer produces,
  *    validated against AWS's published signing vectors in SigV4Spec.
  *  - [[GCloudFunctionSink]] POSTs the function URL with a Bearer token.
  *    Token minting is real too: [[GcpIdTokenProvider]] signs the
  *    service-account RS256 jwt-bearer assertion and exchanges it at the
  *    credential's token_uri (gcloud_functions.go's idtoken.NewClient
  *    flow) — the provider remains injectable for tests/custom auth.
  *
  * Result mapping matches [[HttpSink]]: 2xx → delivered, timeout → 601,
  * connect/IO error → 600, other statuses → themselves (429/5xx then retry
  * via [[Backoff.isRetryable]]).
  */
object CloudSinks {

  private[streaming] val AmzDateFormat =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'", Locale.ROOT)
      .withZone(ZoneOffset.UTC)

  /** arn:aws:lambda:<region>:<account>:function:<name> → (region, name). */
  def parseFunctionArn(arn: String): (String, String) = {
    val parts = arn.split(":", -1)
    require(parts.length >= 7 && parts(2) == "lambda" && parts(5) == "function",
      s"not a lambda function ARN: $arn")
    (parts(3), parts(6))
  }
}

final class LambdaSink(
    functionArn: String,
    accessKeyId: String,
    secretAccessKey: String,
    endpointOverride: Option[String] = None,
    timeoutMillis: Long = 5000,
    clock: () => Instant = () => Instant.now())
  extends (Deliverable => Either[Int, Unit]) with Serializable {

  private val (region, functionName) = CloudSinks.parseFunctionArn(functionArn)
  private val endpoint =
    endpointOverride.getOrElse(s"https://lambda.$region.amazonaws.com")
  private val path = s"/2015-03-31/functions/$functionName/invocations"

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()

  override def apply(d: Deliverable): Either[Int, Unit] = {
    try {
      val uri = URI.create(endpoint + path)
      val host = uri.getAuthority
      val amzDate = CloudSinks.AmzDateFormat.format(clock())
      val payload = Option(d.body).getOrElse("").getBytes(StandardCharsets.UTF_8)
      val contentType = Option(d.contentType).getOrElse("application/json")
      val auth = SigV4.authorization(
        method = "POST", path = path, query = Seq.empty,
        headers = Seq("host" -> host, "x-amz-date" -> amzDate,
          "content-type" -> contentType),
        payload = payload, accessKeyId = accessKeyId,
        secretKey = secretAccessKey, region = region, service = "lambda",
        amzDate = amzDate)
      val req = HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("Content-Type", contentType)
        .header("X-Amz-Date", amzDate)
        .header("Authorization", auth)
        .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
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

final class GCloudFunctionSink(
    url: String,
    tokenProvider: () => String,
    timeoutMillis: Long = 5000)
  extends (Deliverable => Either[Int, Unit]) with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()

  override def apply(d: Deliverable): Either[Int, Unit] = {
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("Content-Type", Option(d.contentType).getOrElse("application/json"))
        .header("Authorization", s"Bearer ${tokenProvider()}")
        .POST(HttpRequest.BodyPublishers.ofString(
          Option(d.body).getOrElse(""), StandardCharsets.UTF_8))
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
