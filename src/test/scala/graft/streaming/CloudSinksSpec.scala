package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.json.{JObj, JStr, JValue}
import graft.streaming.SubscriptionRunner.Deliverable
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.Base64
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

  // --- GCloud service-account ID-token mint (GcpAuth) ---

  private def freshServiceAccount(tokenUri: String): (String, java.security.PublicKey) =
    GcpAuth.syntheticServiceAccount(tokenUri)

  test("service-account JWT: header/claims/signature verify against an independent RSA verifier") {
    val (credJson, pubKey) = freshServiceAccount("https://oauth2.example/token")
    val sa = GcpAuth.parseServiceAccount(credJson)
    assert(sa.clientEmail === "runner@proj.iam.gserviceaccount.com")
    assert(sa.tokenUri === "https://oauth2.example/token")

    val iat = Instant.parse("2024-06-01T12:00:00Z")
    val jwt = GcpAuth.idTokenAssertion(sa, "https://region-proj.cloudfunctions.net/fn1", iat)
    val Array(h64, c64, s64) = jwt.split('.')

    // signature: verify over exactly the signing input with the public key
    val ver = java.security.Signature.getInstance("SHA256withRSA")
    ver.initVerify(pubKey)
    ver.update(s"$h64.$c64".getBytes(StandardCharsets.US_ASCII))
    assert(ver.verify(Base64.getUrlDecoder.decode(s64)), "RS256 signature must verify")

    // header + claims decode to the documented flow fields
    def decode(part: String): JObj =
      JValue.parse(new String(Base64.getUrlDecoder.decode(part), StandardCharsets.UTF_8))
        .asInstanceOf[JObj]
    val header = decode(h64)
    assert(header.get("alg") === Some(JStr("RS256")))
    assert(header.get("typ") === Some(JStr("JWT")))
    val claims = decode(c64)
    assert(claims.get("iss") === Some(JStr("runner@proj.iam.gserviceaccount.com")))
    assert(claims.get("sub") === Some(JStr("runner@proj.iam.gserviceaccount.com")))
    assert(claims.get("aud") === Some(JStr("https://oauth2.example/token")))
    assert(claims.get("target_audience") ===
      Some(JStr("https://region-proj.cloudfunctions.net/fn1")))
    assert(claims.get("iat") === Some(graft.json.JInt(1717243200L)))
    assert(claims.get("exp") === Some(graft.json.JInt(1717243200L + 3600)))
  }

  test("token provider exchanges the assertion at token_uri and caches until expiry") {
    val received = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        received.add((ex.getRequestHeaders.getFirst("Content-Type"), body))
        val resp = """{"id_token":"minted-tok-1"}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val tokenUri = s"http://127.0.0.1:${server.getAddress.getPort}/token"
      val (credJson, pubKey) = freshServiceAccount(tokenUri)
      var now = Instant.parse("2024-06-01T12:00:00Z")
      val provider = new GcpIdTokenProvider(credJson,
        "https://region-proj.cloudfunctions.net/fn1", clock = () => now)
      assert(provider() === "minted-tok-1")
      assert(provider() === "minted-tok-1") // within ttl: served from cache
      assert(received.size === 1, "second call must not re-exchange")

      val (ct, body) = received.poll()
      assert(ct === "application/x-www-form-urlencoded")
      val params = body.split('&').map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      assert(params("grant_type") === GcpAuth.JwtBearerGrant)
      // the posted assertion is a verifiable JWT signed by our key
      val Array(h64, c64, s64) = params("assertion").split('.')
      val ver = java.security.Signature.getInstance("SHA256withRSA")
      ver.initVerify(pubKey)
      ver.update(s"$h64.$c64".getBytes(StandardCharsets.US_ASCII))
      assert(ver.verify(Base64.getUrlDecoder.decode(s64)))

      // past expiry: re-exchange
      now = now.plusSeconds(3600)
      assert(provider() === "minted-tok-1")
      assert(received.size === 1) // new exchange happened (queue had been drained by poll)
    } finally server.stop(0)
  }

  test("GCloudFunctionsSa config wires mint + sink end-to-end") {
    // one server plays both token endpoint and function URL
    val calls = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        calls.add((ex.getRequestURI.getPath,
          Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")))
        if (ex.getRequestURI.getPath == "/token") {
          val resp = """{"id_token":"fn-tok"}""".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
        } else ex.sendResponseHeaders(204, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val (credJson, _) = freshServiceAccount(s"$base/token")
      val delivery = Sinks.forConfig(Sinks.GCloudFunctionsSa(
        s"$base/fn", Sinks.GCloudCredential(credJson)))
      delivery match {
        case SubscriptionRunner.Delivery.PerEvent(fn) =>
          assert(fn(event("""{"y":3}""")) === Right(()))
        case other => fail(s"unexpected delivery mode: $other")
      }
      val paths = calls.toArray(Array.empty[(String, String)])
      assert(paths.map(_._1).toSeq === Seq("/token", "/fn"))
      assert(paths(1)._2 === "Bearer fn-tok")
    } finally server.stop(0)
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
