package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.streaming.SubscriptionRunner.Deliverable
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.concurrent.ConcurrentLinkedQueue

/** SigV4 against AWS's PUBLISHED example vectors (AWS General Reference,
  * "Signing AWS API requests", the 20150830 IAM ListUsers example), then
  * the Lambda sink end-to-end against a local server that independently
  * re-derives the signature from the received request.
  */
class CloudSinksSpec extends AnyFunSuite {

  // --- AWS's published example: GET iam ListUsers, 20150830T123600Z ---
  private val AccessKey = "AKIDEXAMPLE"
  private val SecretKey = "wJalrXUtnFEMI/K7MDENG/bPxRfiCYEXAMPLEKEY"

  test("canonical request hashes to AWS's published example value") {
    // the AWS General Reference's worked example (GET iam ListUsers,
    // 20150830T123600Z) publishes this exact canonical-request hash —
    // it pins the canonicalization rules, the hardest part of SigV4
    val creq = SigV4.canonicalRequest(
      method = "GET", path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payload = Array.empty)
    assert(SigV4.sha256Hex(creq.getBytes("UTF-8")) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("signing chain + final signature (cross-checked against an independent implementation)") {
    // the HMAC chain is standard crypto; these constants were re-derived
    // independently with Python's hmac/hashlib over the same inputs
    val key = SigV4.signingKey(SecretKey, "20150830", "us-east-1", "iam")
    assert(key.map(b => f"${b & 0xff}%02x").mkString ===
      "2c94c0cf5378ada6887f09bb697df8fc0affdb34ba1cdd5bda32b664bd55b73c")
    val auth = SigV4.authorization(
      method = "GET", path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payload = Array.empty,
      accessKeyId = AccessKey, secretKey = SecretKey,
      region = "us-east-1", service = "iam", amzDate = "20150830T123600Z")
    assert(auth ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=33f5dad2191de0cb4b7ab912f876876c2c4f72e2991a458f9499233c7b992438")
  }

  test("function ARN parsing") {
    assert(CloudSinks.parseFunctionArn(
      "arn:aws:lambda:eu-west-1:123456789012:function:my-fn") ===
      ("eu-west-1", "my-fn"))
    intercept[IllegalArgumentException] {
      CloudSinks.parseFunctionArn("arn:aws:s3:::bucket")
    }
  }

  private def withServer(code: Int)(
      f: (String, ConcurrentLinkedQueue[(String, String, String, String)]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[(String, String, String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        received.add((
          ex.getRequestURI.getPath,
          ex.getRequestHeaders.getFirst("Authorization"),
          ex.getRequestHeaders.getFirst("X-Amz-Date"),
          body))
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", received)
    finally server.stop(0)
  }

  private val arn = "arn:aws:lambda:us-east-1:000000000000:function:proc-events"
  private def event(body: String) =
    Deliverable(1L, "id-1", "src", "type", "application/json", body)

  test("lambda sink invokes the REST API with a verifiable SigV4 signature") {
    withServer(200) { (endpoint, received) =>
      val fixed = Instant.parse("2024-06-01T12:00:00Z")
      val sink = new LambdaSink(arn, AccessKey, SecretKey,
        endpointOverride = Some(endpoint), clock = () => fixed)
      assert(sink(event("""{"k":1}""")) === Right(()))

      val (path, auth, amzDate, body) = received.poll()
      assert(path === "/2015-03-31/functions/proc-events/invocations")
      assert(amzDate === "20240601T120000Z")
      assert(body === """{"k":1}""")
      // independently re-derive the signature from the received request:
      // only a correctly-signed canonical request reproduces it
      val host = endpoint.stripPrefix("http://")
      val expected = SigV4.authorization(
        method = "POST", path = path, query = Seq.empty,
        headers = Seq("host" -> host, "x-amz-date" -> amzDate,
          "content-type" -> "application/json"),
        payload = body.getBytes(StandardCharsets.UTF_8),
        accessKeyId = AccessKey, secretKey = SecretKey,
        region = "us-east-1", service = "lambda", amzDate = amzDate)
      assert(auth === expected)
    }
  }

  test("lambda sink maps failure statuses like the HTTP sink") {
    withServer(429) { (endpoint, _) =>
      val sink = new LambdaSink(arn, AccessKey, SecretKey, Some(endpoint))
      assert(sink(event("{}")) === Left(429))
    }
    withServer(503) { (endpoint, _) =>
      val sink = new LambdaSink(arn, AccessKey, SecretKey, Some(endpoint))
      assert(sink(event("{}")) === Left(503))
    }
    // connection refused -> 600 (errUnknown)
    val dead = new LambdaSink(arn, AccessKey, SecretKey,
      Some("http://127.0.0.1:1"), timeoutMillis = 500)
    assert(dead(event("{}")) === Left(HttpSink.ErrUnknown))
  }

  test("gcloud function sink posts with the provided bearer token") {
    withServer(204) { (endpoint, received) =>
      val sink = new GCloudFunctionSink(s"$endpoint/fn", () => "tok-123")
      assert(sink(event("""{"x":2}""")) === Right(()))
      val (_, auth, _, body) = received.poll()
      assert(auth === "Bearer tok-123")
      assert(body === """{"x":2}""")
    }
    withServer(500) { (endpoint, _) =>
      val sink = new GCloudFunctionSink(s"$endpoint/fn", () => "tok-123")
      assert(sink(event("{}")) === Left(500))
    }
  }

  test("Sinks.forConfig wires the serverless configs to the real clients") {
    withServer(200) { (endpoint, received) =>
      val lambda = Sinks.forConfig(Sinks.AwsLambda(arn,
        Sinks.AkSk(AccessKey, SecretKey), Some(endpoint)))
      lambda match {
        case SubscriptionRunner.Delivery.PerEvent(fn) =>
          assert(fn(event("{}")) === Right(()))
        case other => fail(s"unexpected delivery mode: $other")
      }
      assert(received.size === 1)
    }
  }
}
