package graft.streaming

import graft.streaming.SubscriptionRunner.{BatchSink, Delivery, Deliverable, Sink}

/** Sink protocol selection — the reference's newEventClient switch
  * (/root/reference/server/trigger/trigger/util.go:35-52): HTTP (default,
  * optional gateway), gRPC batch, AWS Lambda, GCloud Functions, with
  * credential shapes from pkg/primitive.
  *
  * HTTP and batched-HTTP are fully implemented ([[HttpSink]],
  * [[HttpBatchSink]]). Lambda / GCloud Functions need cloud SDKs this
  * library deliberately doesn't depend on — per SURVEY §2.1 they are kept
  * as typed configuration plus a transport seam: the caller supplies the
  * invoke function (the SDK call), and everything else (selection, batch
  * accumulation, retry/DLQ routing, credentials plumbing) is handled here.
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
      timeoutMillis: Long = 5000) extends SinkConfig
  final case class AwsLambda(functionArn: String, credential: AkSk,
      invoke: Deliverable => Either[Int, Unit]) extends SinkConfig
  final case class GCloudFunctions(url: String, credential: GCloudCredential,
      invoke: Deliverable => Either[Int, Unit]) extends SinkConfig

  /** util.go:35-52 — pick the delivery mode for a config. gRPC transport
    * is carried by CloudEvents batched HTTP (same one-call-per-batch,
    * whole-batch-result semantics; no gRPC deps in this library).
    */
  def forConfig(cfg: SinkConfig): Delivery = cfg match {
    case Http(url, t, None) => Delivery.PerEvent(new HttpSink(url, t))
    case Http(url, t, Some(gw)) =>
      Delivery.PerEvent(HttpSink.withGateway(url, gw.address, gw.targetHeaderName, t))
    case GrpcBatch(url, size, t) =>
      Delivery.Batched(new HttpBatchSink(url, t), size)
    case AwsLambda(_, _, invoke) => Delivery.PerEvent(invoke(_))
    case GCloudFunctions(_, _, invoke) => Delivery.PerEvent(invoke(_))
  }
}
