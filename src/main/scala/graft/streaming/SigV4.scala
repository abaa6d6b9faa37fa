package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the public algorithm from the
  * AWS General Reference ("Signing AWS API requests"), implemented on JDK
  * crypto only. Validated in SigV4Spec against AWS's published example
  * vectors (the 20150830 IAM ListUsers request and the documented
  * signing-key derivation chain).
  *
  * Reference counterpart: the Lambda sink's SDK performs exactly this
  * signing internally (/root/reference/server/trigger/client/lambda.go uses
  * aws-sdk-go's v4 signer).
  */
object SigV4 {

  private val Algorithm = "AWS4-HMAC-SHA256"

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  def sha256Hex(data: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(data))

  /** RFC 3986 encoding with AWS's rules: unreserved chars stay, space is
    * %20, everything else percent-encoded uppercase. `keepSlash` for path
    * segments vs query values.
    */
  def uriEncode(s: String, keepSlash: Boolean = false): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c) || (keepSlash && c == '/'))
        sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** The documented four-step HMAC signing-key chain. */
  def signingKey(secretKey: String, date: String, region: String,
      service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  /** Build the Authorization header value for a request. `amzDate` is the
    * ISO-basic timestamp (yyyyMMdd'T'HHmmss'Z'); headers must already
    * include host and x-amz-date (they are signed as given).
    */
  /** The canonical request string (exposed so tests can pin its SHA-256
    * against the AWS-published example hash).
    */
  def canonicalRequest(
      method: String,
      path: String,
      query: Seq[(String, String)],
      headers: Seq[(String, String)],
      payload: Array[Byte]): String = {
    val canonicalUri =
      if (path.isEmpty) "/"
      else path.split("/", -1).map(uriEncode(_)).mkString("/")
    val canonicalQuery = query
      .map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    val normHeaders = headers
      .map { case (k, v) => (k.toLowerCase, v.trim.replaceAll(" +", " ")) }
      .sortBy(_._1)
    val canonicalHeaders = normHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = normHeaders.map(_._1).mkString(";")
    Seq(method.toUpperCase, canonicalUri, canonicalQuery, canonicalHeaders,
      signedHeaders, sha256Hex(payload)).mkString("\n")
  }

  def authorization(
      method: String,
      path: String,
      query: Seq[(String, String)],
      headers: Seq[(String, String)],
      payload: Array[Byte],
      accessKeyId: String,
      secretKey: String,
      region: String,
      service: String,
      amzDate: String): String = {
    val date = amzDate.substring(0, 8)
    val signedHeaders = headers.map(_._1.toLowerCase).sorted.mkString(";")
    val canonicalRequestStr =
      canonicalRequest(method, path, query, headers, payload)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq(Algorithm, amzDate, scope,
      sha256Hex(canonicalRequestStr.getBytes(StandardCharsets.UTF_8))).mkString("\n")
    val signature = hex(hmac(signingKey(secretKey, date, region, service), stringToSign))
    s"$Algorithm Credential=$accessKeyId/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}
