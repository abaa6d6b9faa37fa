package graft.streaming

import graft.streaming.SubscriptionRunner.{BatchSink, Delivery, Deliverable, Sink}

/** Sink protocol selection — the reference's newEventClient switch
  * (/root/reference/server/trigger/trigger/util.go:35-52): HTTP (default,
  * optional gateway), gRPC batch, AWS Lambda, GCloud Functions, with
  * credential shapes from pkg/primitive.
  *
  * HTTP and batched-HTTP are fully implemented ([[HttpSink]],
  * [[HttpBatchSink]]). Lambda invokes through the REAL public Invoke REST
  * API with [[SigV4]]-signed requests ([[LambdaSink]] — no SDK dependency);
  * GCloud Functions POSTs the function URL with a Bearer ID token minted
  * from the service-account credential via the RS256 jwt-bearer exchange
  * ([[GcpIdTokenProvider]] — no SDK dependency); a pre-supplied token
  * provider remains available for tests/custom auth.
  */
object Sinks {

  sealed trait Credential
  final case class AkSk(accessKeyId: String, secretAccessKey: String) extends Credential
  final case class GCloudCredential(credentialJson: String) extends Credential

  /** NewHTTPClientWithGateway shape: deliver to the gateway address, real
    * sink URL in the named header (http.go:36-41).
    */
  final case class Gateway(address: String, targetHeaderName: String)

  sealed trait SinkConfig
  final case class Http(url: String, timeoutMillis: Long = 5000,
      gateway: Option[Gateway] = None) extends SinkConfig
  final case class GrpcBatch(url: String, sendBatchSize: Int = 16,
      timeoutMillis: Long = 5000, eventbusId: Long = 0L) extends SinkConfig
  final case class AwsLambda(functionArn: String, credential: AkSk,
      endpointOverride: Option[String] = None,
      timeoutMillis: Long = 5000) extends SinkConfig
  final case class GCloudFunctions(url: String, tokenProvider: () => String,
      timeoutMillis: Long = 5000) extends SinkConfig
  /** The reference's actual config shape (gcloud_functions.go: url +
    * credential JSON); the token provider is built from the credential.
    * `tokenUriOverride` redirects the exchange (tests).
    */
  final case class GCloudFunctionsSa(url: String, credential: GCloudCredential,
      tokenUriOverride: Option[String] = None,
      timeoutMillis: Long = 5000) extends SinkConfig

  /** util.go:35-52 — pick the delivery mode for a config. The gRPC batch
    * client speaks the reference's native protobuf wire format
    * ([[GrpcBatchSink]] / [[CeProto]]); [[HttpBatchSink]] remains for
    * CloudEvents batched-JSON endpoints.
    */
  def forConfig(cfg: SinkConfig): Delivery = cfg match {
    case Http(url, t, None) => Delivery.PerEvent(new HttpSink(url, t))
    case Http(url, t, Some(gw)) =>
      Delivery.PerEvent(HttpSink.withGateway(url, gw.address, gw.targetHeaderName, t))
    case GrpcBatch(url, size, t, busId) =>
      Delivery.Batched(new GrpcBatchSink(url, busId, t), size)
    case AwsLambda(arn, cred, endpoint, t) =>
      Delivery.PerEvent(new LambdaSink(arn, cred.accessKeyId,
        cred.secretAccessKey, endpoint, t))
    case GCloudFunctions(url, tokens, t) =>
      Delivery.PerEvent(new GCloudFunctionSink(url, tokens, t))
    case GCloudFunctionsSa(url, cred, tokenUri, t) =>
      Delivery.PerEvent(new GCloudFunctionSink(url,
        new GcpIdTokenProvider(cred.credentialJson, url, tokenUri, t), t))
  }
}
